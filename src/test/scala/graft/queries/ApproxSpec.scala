package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

/** Sketch-aggregate accuracy vs exact answers (the approx_stats query has
  * no DuckDB oracle — sketches are engine-specific).
  */
class ApproxSpec extends SparkSpec {

  test("approx_stats: accuracy flags all true; raw sketches bounded vs exact") {
    val events = Fixtures.table(spark, sf001, "events")
    val out = RelationalQueries.approxStats(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)}: users_within_15pct false")
      assert(r.getBoolean(4), s"${r.getString(0)}: p50_within_5pct false")
    }
    // independent, tighter bound on the raw sketches than the query flags
    val approx = events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("au"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("ap"))
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

  test("approx decile boundaries agree with the exact ntile deciles") {
    val approx = TextQueries.qualityDecilesApprox(spark, sf001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val exact = TextQueries.qualityDeciles(spark, sf001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(approx.keySet == (1L to 10L).toSet, s"all deciles present: ${approx.keySet}")
    val n = exact.values.map(_._1).sum
    (1L to 10L).foreach { d =>
      // populations within 20% of the exact decile (sketch rank error +
      // boundary-tie policy are the only divergence sources)
      assert(math.abs(approx(d)._1 - exact(d)._1).toDouble / (n / 10.0) < 0.2,
        s"decile $d: ${approx(d)._1} vs ${exact(d)._1}")
      // score ranges must be ordered and near the exact decile's range
      if (d > 1L) assert(approx(d)._2 >= approx(d - 1)._3, s"decile $d overlaps $d-1")
      assert(math.abs(approx(d)._3 - exact(d)._3) < 0.05,
        s"decile $d q_max: ${approx(d)._3} vs ${exact(d)._3}")
    }
  }

  test("percentile tie rule: a rank inside a tie run returns the tied value EXACTLY") {
    // quality_deciles_approx's oracle safety on tie-heavy data rests on
    // this engine property: when the two bracketing order statistics are
    // EQUAL (a tie run spans the rank), Spark's Percentile skips the
    // interpolation arithmetic and returns the key itself — bit-identical
    // to DuckDB's quantile_cont, which computes lo + g*(hi-lo) = lo
    // exactly when hi == lo. If Spark instead computed (1-g)*v + g*v, the
    // two products' rounding could drift a boundary by 1 ulp and bucket a
    // whole tie group differently per engine. v = 0.1 is chosen because
    // its g-products ARE inexact — the test fails loudly if the engine
    // ever loses the special case.
    import spark.implicits._
    val v = 0.1
    // n = 100, ranks 0..99; p = 0.3 -> position 29.7, both brackets in
    // the 50-long tie run
    val data = (Seq.fill(50)(v) ++ (1 to 50).map(i => 1.0 + i * 0.01)).toDF("q")
    val got = data.selectExpr("percentile(q, 0.3) AS b").collect().head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(v),
      s"expected the exact tied value ${java.lang.Double.toHexString(v)}, " +
        s"got ${java.lang.Double.toHexString(got)}")
    // distinct brackets: result strictly interior, so a data value equal
    // to either bracket buckets identically under `<` on both engines
    val d2 = (Seq(0.0, 1.0) ++ (1 to 98).map(_ + 100.0)).toDF("q")
    val b2 = d2.selectExpr("percentile(q, 0.005) AS b").collect().head.getDouble(0)
    assert(b2 > 0.0 && b2 < 1.0, s"interpolated boundary must be interior: $b2")
  }

  test("percentile_approx boundaries reproduce the exact-boundary deciles") {
    // the registered query computes exact interpolated boundaries (the
    // oracle-able form); the 100 TB swap is percentile_approx on the SAME
    // plan — pin that the sketch boundaries land every row in the same
    // decile on the fixtures (accuracy 10000 >> n, so rank error < 1)
    import graft.functions.TextFunctions
    val scored = Fixtures.table(spark, sf001, "documents")
      .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
    val bounds = scored.agg(percentile_approx(col("q"),
      array((1 to 9).map(d => lit(d / 10.0)): _*), lit(10000)).as("b"))
    val approx = scored.crossJoin(broadcast(bounds))
      .select((size(filter(col("b"), x => x < col("q"))) + 1).cast("long").as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("n_docs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val registered = TextQueries.qualityDecilesApprox(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet == registered.keySet)
    val n = registered.values.sum
    registered.foreach { case (d, cnt) =>
      assert(math.abs(approx(d) - cnt).toDouble / (n / 10.0) < 0.2,
        s"decile $d: sketch ${approx(d)} vs exact-boundary $cnt")
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
