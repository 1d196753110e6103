package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: fold new raw partitions into a
  * persisted rollup WITHOUT rescanning history — at 100 TB the daily
  * delta is the only thing you can afford to read, so every kept metric
  * must be RE-AGGREGATABLE (a commutative monoid over partial states):
  * counts and exact integer-cent sums add, min/max fold, distinct users
  * ride an HLL sketch column merged with `hll_union_agg` (the
  * uniqState/uniqMerge pattern), and averages are DERIVED at read time
  * (a stored avg cannot be re-aggregated). The maintenance invariant —
  * `merge(daily(old), daily(delta)) == daily(old ∪ delta)` row for row
  * on the exact columns — is what the driver oracle checks, and
  * RollupSpec folds day by day to pin associativity.
  *
  * Scale shape: `daily(delta)` scans only the delta; `merge` shuffles
  * partial states on the rollup key (tiny next to raw events: one row
  * per (day, type)); composing with ParquetCatalog.replaceTable (or a
  * MERGE on the day key) persists the result. Nothing rescans history.
  */
object Rollup {

  /** Full (or delta) daily rollup: one map-side-combinable aggregate
    * pass. Values are kept as exact integer cents so partial sums are
    * order-independent; the user sketch is a binary HLL state.
    */
  def daily(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"),
        min(round(col("value") * 100).cast("long")).as("min_cents"),
        max(round(col("value") * 100).cast("long")).as("max_cents"),
        hll_sketch_agg(col("user_id")).as("user_sk"))

  /** Merge two rollup states (current table + a delta rollup). Counts
    * and cent-sums add, min/max fold, sketches union — every column is
    * a monoid, so merge order never changes the result.
    */
  def merge(current: DataFrame, delta: DataFrame): DataFrame =
    current.unionByName(delta)
      .groupBy(col("d"), col("event_type"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("value_cents")).as("value_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"),
        hll_union_agg(col("user_sk")).as("user_sk"))

  /** Read-time projection: derived avg (exact, from the monoid columns)
    * and the sketch estimate materialized as a number.
    */
  def readout(rollup: DataFrame): DataFrame =
    rollup.select(
      col("d"), col("event_type"), col("n"),
      round(col("value_cents") / 100.0, 2).as("value_sum"),
      // avg via explicit floor-rounding, NOT round(x, 4): the cents/n
      // quotient lands on exact .00005 ties where Spark's round (on the
      // shortest decimal repr) and DuckDB's (on the binary value)
      // disagree — floor of bit-identical doubles is engine-independent.
      // The sum/min/max rounds are safe: their inputs are exact at 2 dp.
      (floor(col("value_cents") / 100.0 / col("n") * 10000.0 + 0.5) / 10000.0)
        .as("value_avg"),
      round(col("min_cents") / 100.0, 2).as("value_min"),
      round(col("max_cents") / 100.0, 2).as("value_max"),
      hll_sketch_estimate(col("user_sk")).as("users_est"))
}
