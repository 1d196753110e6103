package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

/** Sketch-aggregate accuracy vs exact answers (the approx_stats query has
  * no DuckDB oracle — sketches are engine-specific).
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% and approx median within 10% of exact") {
    val events = Fixtures.table(spark, sf001, "events")
    val approx = RelationalQueries.approxStats(spark, sf001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"),
        expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (u, p50)) =>
      val (au, ap50) = approx(k)
      assert(math.abs(au - u).toDouble / u < 0.05, s"$k distinct: $au vs $u")
      assert(math.abs(ap50 - p50) / math.max(math.abs(p50), 1e-9) < 0.10,
        s"$k p50: $ap50 vs $p50")
    }
  }

  test("unioned daily HLL sketches estimate range reach within 5% of exact") {
    val events = Fixtures.table(spark, sf001, "events")
    val merged = RelationalQueries.hllReach(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet == exact.keySet)
    exact.foreach { case (k, u) =>
      assert(math.abs(merged(k) - u).toDouble / u < 0.05,
        s"$k merged-sketch reach ${merged(k)} vs exact $u")
    }
    // mergeability is the point: union-of-daily == sketch-over-everything
    val direct = events.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("r"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.keySet.foreach { k =>
      assert(math.abs(merged(k) - direct(k)).toDouble / math.max(direct(k), 1) < 0.02,
        s"$k union-of-daily ${merged(k)} vs direct ${direct(k)}")
    }
  }
}
