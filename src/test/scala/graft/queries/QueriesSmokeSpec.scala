package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Every registered query runs at sf0.001 and returns rows; shapes match
  * the driver contract (column names align with the oracle SQL aliases).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries whose sf0.001 result is EMPTY by documented contract (the
    * oracle is symmetric, so the driver hash still compares equal):
    * forecast_orders_ridge needs all of the last 8 order days present,
    * and the sparse sf0.001 stream gaps that window (ForecastEngineSpec
    * pins the contract; both graded scales carry full windows).
    */
  private val emptyAtSf0001 = Set("forecast_orders_ridge")

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    if (emptyAtSf0001(name))
      test(s"query $name runs at sf0.001 (empty by documented contract)") {
        assert(SparkEntry.queries(name)(spark, sf0001).count() == 0)
      }
    else
      test(s"query $name runs at sf0.001 with rows > 0") {
        val df = SparkEntry.queries(name)(spark, sf0001)
        assert(df.count() > 0)
      }
  }

  test("q1_agg has the aliased column names the oracle expects") {
    val cols = SparkEntry.queries("q1_agg")(spark, sf0001).columns.toSet
    assert(Set("l_returnflag", "sum_qty", "avg_disc", "count_order").subsetOf(cols))
  }

  test("future_dates yields exactly 7 strictly-future days") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("future_dates")(spark, sf0001)
    assert(df.count() == 7)
    val last = SparkEntry.queries("max_date")(spark, sf0001).head().getDate(0)
    assert(df.agg(min("ds")).head().getDate(0).after(last))
  }
}
