package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Morton (Z-order) multi-column layout for parquet scan locality
  * [public: Morton 1966; the Delta/Iceberg `OPTIMIZE ZORDER BY` idea].
  *
  * Why it matters at 100 TB: parquet row-group pruning works off per-file
  * min/max column statistics. A table sorted by ONE column gives perfect
  * pruning on that column and none on any other; interleaving the bits of
  * k normalized columns into a single sort key gives every interleaved
  * column min/max ranges of roughly (1/P)^(1/k) of its domain per
  * partition file, so selective predicates on ANY of them skip most
  * files. The key is a pure codegen'd projection (shift/mask/or — no UDF,
  * no shuffle beyond the one range-repartition the layout write needs
  * anyway).
  *
  * The caller supplies per-column bounds (or lets [[bounds]] compute them
  * in one tiny aggregate — 2k doubles to the driver, the same bounded
  * collect shape as an MLlib fit). Rows outside the bounds clamp to the
  * edge buckets, so a stale-bounds re-layout degrades locality but never
  * corrupts placement.
  */
object ZOrder {

  /** Scales `c` to an integer bucket in [0, 2^bits) given closed bounds. */
  def unitBucket(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    val max = (1L << bits) - 1
    least(lit(max), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(span) * lit(1L << bits))
        .cast("long")))
  }

  /** Interleaves the low `bits` bits of k bucket columns (each already in
    * [0, 2^bits)) into one Morton key; column j contributes bit i to key
    * bit i*k + j, so k*bits must fit a signed long.
    */
  def mortonKey(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty, "need at least one column")
    require(buckets.length * bits <= 63,
      s"${buckets.length} cols x $bits bits overflows a long key")
    val k = buckets.length
    (0 until bits).flatMap { i =>
      buckets.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** One-pass min/max bounds for `cols` — the only non-projection step. */
  def bounds(df: DataFrame, cols: Seq[String]): Seq[(String, Double, Double)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    cols.zipWithIndex.map { case (c, i) =>
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"ZOrder.bounds: column '$c' has no non-null values " +
          "(empty input or all-null column) — supply bounds explicitly")
      (c, row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
  }

  /** The composed key for `cols` with given (or computed) bounds. */
  def zkey(df: DataFrame, cols: Seq[String], bits: Int = 16,
      precomputed: Option[Seq[(String, Double, Double)]] = None): Column = {
    val bs = precomputed.getOrElse(bounds(df, cols))
    mortonKey(bs.map { case (c, lo, hi) => unitBucket(col(c), lo, hi, bits) }, bits)
  }

  /** Re-layouts `df` into `numFiles` z-ordered range partitions: files are
    * contiguous Morton-key slabs, so every interleaved column gets narrow
    * per-file min/max stats. The key is a sort EXPRESSION — nothing is
    * added to the schema. One range exchange (sampled boundaries), local
    * sort inside each output task, no global sort.
    */
  def layout(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 16): DataFrame = {
    val key = zkey(df, cols, bits)
    df.repartitionByRange(numFiles, key).sortWithinPartitions(key)
  }
}
