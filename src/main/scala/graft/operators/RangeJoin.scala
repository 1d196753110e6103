package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join without a nested loop.
  *
  * Spark plans a bare `a.v >= b.lo AND a.v < b.hi` join as
  * BroadcastNestedLoopJoin (or worse, a cartesian product) — O(|a| x |b|)
  * compare operations that no amount of cluster width fixes at 100 TB.
  * The standard fix is binning: quantize the value axis into fixed-width
  * bins, explode each right interval to every bin it overlaps, equi-join
  * on the bin id, and apply the exact range predicate within bins. Work
  * becomes |a| + sum(interval_width / binWidth) candidate rows, all
  * flowing through a hash-partitioned equi-join that AQE can re-plan.
  * Pick binWidth near the typical interval width: too small multiplies
  * the exploded right side, too large widens per-bin candidate lists.
  */
object RangeJoin {

  /** Inner-joins `left` rows to `right` interval rows with
    * `left(valueCol) in [right(loCol), right(hiCol))`.
    */
  def binned(
      left: DataFrame,
      valueCol: String,
      right: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = left.withColumn("__bin", floor(col(valueCol) / binWidth))
    // Explode through floor(hi/binWidth) unconditionally. An interval whose
    // exclusive hi sits exactly on a bin boundary gets one spurious bin, but
    // deciding that via `hi % binWidth === 0` in floating point can disagree
    // with the left side's floor(v / binWidth) for non-bin-granular doubles
    // and silently drop a matching row; the exact in-bin predicate below
    // discards the extra candidates at the cost of one bin per interval.
    // Empty intervals (hi <= lo) are dropped up front — sequence() would
    // otherwise count DOWN for them.
    val rb = right
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bin",
        explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    lb.join(rb, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }
}
