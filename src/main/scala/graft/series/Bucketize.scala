package graft.series

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derives reference-shaped daily bucket tables (`date` + numeric metrics,
  * reference README.md:33) from the raw fixture tables — the data-producing
  * front end the reference assumes already exists in ClickHouse (its inputs
  * are pre-bucketed `bucket_*` tables; see forecast_script.py:121-124).
  *
  * One shuffle on the date key; map-side partial aggregation applies, so at
  * 100 TB this reduces to (input scan + one exchange keyed by ~N_days
  * groups).
  */
object Bucketize {

  /** events -> bucket_events: see FIXTURES.md §B. Sums are rounded to 2
    * decimals so results are stable across summation orders (Spark partial
    * aggs vs the DuckDB oracle's serial sum).
    */
  def events(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("date"))
      .agg(
        count(lit(1)).as("event_count"),
        round(sum(col("value")), 2).as("value_sum"),
        countDistinct(col("user_id")).as("active_users"))

  /** orders -> bucket_orders: long-history fixture (~6.5 years of dates). */
  def orders(orders: DataFrame): DataFrame =
    orders
      .groupBy(to_date(col("o_orderdate")).as("date"))
      .agg(
        count(lit(1)).as("order_count"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
}
