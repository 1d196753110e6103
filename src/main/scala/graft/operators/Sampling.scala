package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic splitting and sampling for training-data pipelines.
  *
  * Spark's `randomSplit`/`sample` draw per-partition random streams, so
  * membership changes under repartitioning, task retries, and input
  * re-ordering. Hashing a STABLE id instead gives membership that is a
  * pure function of the row — it survives reruns, cluster layout, and
  * incremental reprocessing, which is what data lineage requires at
  * 100 TB (the same doc must land in `train` today and next month).
  * Everything is a codegen'd projection/filter: no shuffle, no state.
  */
object Sampling {

  /** Uniform [0, 1) draw as a pure function of (id, seed). */
  private def unit(idCol: String, seed: Long): Column =
    pmod(xxhash64(col(idCol), lit(seed)), lit(1000000000L)).cast("double") / 1e9

  /** Engine-independent uniform [0, 1) draw: the first 6 hex digits of
    * md5 over the DECIMAL string of the id. Any engine with md5 (DuckDB,
    * ClickHouse, Trino, ...) reproduces the exact membership, which makes
    * split assignment auditable outside Spark — the cross-engine parity
    * story a shared 100 TB corpus needs. xxhash64 (the default draw) is
    * faster but Spark-specific.
    */
  def unitMd5(idCol: String): Column =
    conv(substring(md5(col(idCol).cast("string")), 1, 6), 16, 10)
      .cast("double") / lit((1 << 24).toDouble)

  /** Efraimidis–Spirakis A-Res weighted-sampling key [public: Efraimidis
    * & Spirakis, IPL 2006]: each row draws u in (0,1) and the k rows with
    * the largest u^(1/w) form an exact weighted sample without
    * replacement. `ln(u)/w` is the same ordering without the pow; u is
    * the md5 unit draw shifted by +0.5/2^24 so it stays strictly inside
    * (0,1) and ln() is always finite. Membership is reproducible in any
    * engine with md5 — the same cross-engine auditability as
    * [[splitLabelMd5]]. Selecting top-k over this key compiles to a
    * distributed TakeOrdered (per-partition heaps + driver merge of k),
    * not a global sort. `weightCol` must be strictly positive.
    */
  def weightedKeyMd5(idCol: String, weightCol: String): Column =
    log((conv(substring(md5(col(idCol).cast("string")), 1, 6), 16, 10)
      .cast("double") + lit(0.5)) / lit((1 << 24).toDouble)) / col(weightCol)

  /** Nested whens over the cumulative weight bounds; the last label is the
    * unconditional fallback so float edge cases can't drop a row.
    */
  private def labelFor(u: Column, weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be non-empty and positive")
    val total = weights.map(_._2).sum
    val cumHi = weights.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    weights.map(_._1).zip(cumHi).init.reverse
      .foldLeft(lit(weights.last._1): Column) { case (acc, (name, hi)) =>
        when(u < lit(hi), lit(name)).otherwise(acc)
      }
  }

  /** Adds a `split` label column distributing rows across `weights`
    * (label -> positive weight, normalized internally) by hash bucket.
    * Deterministic, disjoint, and exhaustive: every row gets exactly one
    * label, and the same (id, seed) always gets the same label.
    */
  def splitLabel(
      df: DataFrame,
      idCol: String,
      weights: Seq[(String, Double)],
      seed: Long = 7L): DataFrame =
    df.withColumn("split", labelFor(unit(idCol, seed), weights))

  /** [[splitLabel]] with the engine-independent md5 draw (no seed — the
    * draw is a pure function of the id, reproducible in any SQL engine).
    */
  def splitLabelMd5(
      df: DataFrame,
      idCol: String,
      weights: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", labelFor(unitMd5(idCol), weights))

  /** Deterministic per-stratum downsampling: keeps ~`fractions(stratum)`
    * of each stratum (0.0 for strata absent from the map unless
    * `defaultFraction` says otherwise). A filter, not a shuffle —
    * rebalancing a skewed source mix (the curation use case) costs one
    * scan.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      seed: Long = 7L): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val frac = fractions.foldLeft(lit(defaultFraction): Column) {
      case (acc, (k, f)) => when(col(strataCol) === lit(k), lit(f)).otherwise(acc)
    }
    df.filter(unit(idCol, seed) < frac)
  }

  /** EXACT k-per-stratum quota sample: the first `k` rows of each stratum
    * in engine-independent md5 order ("exactly 20 audit docs per
    * language"), with the id as tiebreak so the selection is total-ordered
    * and reproducible anywhere. Unlike [[stratifiedSample]] this
    * guarantees the count, which costs a per-stratum top-k: Spark plans
    * the `row_number <= k` filter as WindowGroupLimit, so each task keeps
    * only its local top-k per stratum BEFORE the exchange — the shuffle
    * carries at most k rows per (task, stratum), never the full stratum,
    * which survives a Zipfian stratum mix at corpus scale.
    */
  def stratifiedExact(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.contains("rn"),
      "input already has an 'rn' column — stratifiedExact emits its rank there")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
