package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

class RollupSpec extends SparkSpec {

  private lazy val events = Fixtures.table(spark, sf0001, "events")

  private def exactRows(df: org.apache.spark.sql.DataFrame) =
    Rollup.readout(df)
      .select("d", "event_type", "n", "value_sum", "value_avg",
        "value_min", "value_max")
      .collect().map(_.toSeq).toSet

  test("one delta merge equals the full recompute on every exact column") {
    val cut = lit("2024-01-15").cast("date")
    val merged = Rollup.merge(
      Rollup.daily(events.filter(to_date(col("ts")) < cut)),
      Rollup.daily(events.filter(to_date(col("ts")) >= cut)))
    assert(exactRows(merged) == exactRows(Rollup.daily(events)))
  }

  test("day-by-day fold is associative: any split sequence reaches the same state") {
    val days = events.select(to_date(col("ts")).as("d")).distinct()
      .orderBy("d").collect().map(_.getDate(0).toString)
    assert(days.length >= 4, "fixture must span several days")
    // fold in three uneven chunks
    val chunks = Seq(days.take(3), days.slice(3, 4), days.drop(4))
    val folded = chunks.map { ds =>
      Rollup.daily(events.filter(to_date(col("ts")).cast("string").isin(ds: _*)))
    }.reduce(Rollup.merge)
    assert(exactRows(folded) == exactRows(Rollup.daily(events)))
  }

  test("merged HLL sketch estimate stays within 5% of exact per (day, type)") {
    val cut = lit("2024-01-10").cast("date")
    val merged = Rollup.merge(
      Rollup.daily(events.filter(to_date(col("ts")) < cut)),
      Rollup.daily(events.filter(to_date(col("ts")) >= cut)))
    val exact = events
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("ex"))
    val bad = Rollup.readout(merged).join(exact, Seq("d", "event_type"))
      .filter(abs(col("users_est") - col("ex")) > col("ex") * 0.05)
      .count()
    assert(bad == 0, s"$bad (day, type) cells drifted past 5%")
  }

  test("empty delta is the identity") {
    val all = Rollup.daily(events)
    val merged = Rollup.merge(all, Rollup.daily(events.filter(lit(false))))
    assert(exactRows(merged) == exactRows(all))
  }
}
