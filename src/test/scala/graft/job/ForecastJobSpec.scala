package graft.job

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.ParquetCatalog
import graft.series.Bucketize
import graft.sources.Fixtures

/** End-to-end golden test (SURVEY.md §5.4): a temp catalog seeded with
  * bucket_events + bucket_orders + an unprefixed table, full job run,
  * schema/row-count/overwrite/bookkeeping assertions.
  */
class ForecastJobSpec extends SparkSpec {

  private def seedCatalog(): ParquetCatalog = {
    val tmp = java.nio.file.Files.createTempDirectory("graftjob").toString
    val cat = new ParquetCatalog(spark, tmp)
    cat.writeTable("bucket_events", Bucketize.events(Fixtures.table(spark, sf0001, "events")))
    cat.writeTable("plain_sales", Bucketize.orders(Fixtures.table(spark, sf0001, "orders")))
    // a table the job must skip: no numeric metrics
    cat.writeTable("bucket_names_only",
      Fixtures.table(spark, sf0001, "region").withColumnRenamed("r_regionkey", "date"))
    cat
  }

  test("full run: creates outputs, correct schema/rows, exact bookkeeping") {
    val cat = seedCatalog()
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val scopeBefore = graft.operators.CacheScope.trackedCount(spark)
    val summary = new ForecastJob(cat, interval = 7).run()

    assert(summary.created.toSet ==
      Set("bucket_forecast_events", "bucket_forecast_plain_sales"))
    assert(summary.successful.toSet == Set("bucket_events", "plain_sales"))
    assert(summary.failedSeries.isEmpty)

    val out = cat.load("bucket_forecast_events")
    assert(out.columns.toSeq == Seq("date",
      "event_count", "event_count_min", "event_count_max",
      "value_sum", "value_sum_min", "value_sum_max",
      "active_users", "active_users_min", "active_users_max"))
    val nHist = cat.load("bucket_events").count()
    assert(out.count() == nHist + 7)
    // per-row band invariant on a real metric
    assert(out.filter(col("value_sum_min") > col("value_sum")).count() == 0)
    // cache hygiene (run() scaladoc): every job-path cache() is paired
    // with a try/finally unpersist, so no cached frame survives the run —
    // the job registers nothing with CacheScope and adds no persistent
    // RDD blocks beyond whatever the shared test session already held
    assert(graft.operators.CacheScope.trackedCount(spark) == scopeBefore,
      "the job path must not register frames with CacheScope")
    assert(spark.sparkContext.getPersistentRDDs.keySet
      .subsetOf(persistedBefore),
      "a completed run must leave no new cached frames behind")
  }

  test("backtest: writes bucket_backtest_<t> metrics tables, skips short/ineligible, reruns don't re-ingest outputs") {
    val cat = seedCatalog()
    val summary = new ForecastJob(cat, interval = 7)
      .backtest(horizon = 7, period = 3, initial = 14)
    assert(summary.created.toSet ==
      Set("bucket_backtest_events", "bucket_backtest_plain_sales"))
    assert(summary.successful.toSet == Set("bucket_events", "plain_sales"))
    assert(summary.skipped.exists(_._1 == "bucket_names_only"))

    val bt = cat.load("bucket_backtest_events")
    assert(bt.columns.toSeq ==
      Seq("metric", "cutoff", "n", "mae", "rmse", "coverage", "mae_naive"))
    // 30-day fixture, horizon 7, period 3, initial 14 -> 4 cutoffs x 3 metrics
    assert(bt.count() == 12, s"got ${bt.count()} rows")
    assert(bt.filter(col("rmse") < col("mae")).count() == 0)
    assert(bt.filter(col("coverage") < 0 || col("coverage") > 1).count() == 0)

    // a second run must classify outputs as updates AND must not try to
    // backtest the bucket_backtest_/bucket_forecast_ outputs themselves
    new ForecastJob(cat, 7).run() // create forecast outputs too
    val s2 = new ForecastJob(cat, 7).backtest(7, 3, 14)
    assert(s2.created.isEmpty)
    assert(s2.updated.toSet ==
      Set("bucket_backtest_events", "bucket_backtest_plain_sales"))
    assert(!s2.successful.exists(t =>
      t.startsWith("bucket_backtest_") || t.startsWith("bucket_forecast_")))
  }

  test("backtestUnioned: one grouped shuffle, outputs identical to the per-table form") {
    val cat1 = seedCatalog()
    val s1 = new ForecastJob(cat1, 7).backtest(7, 3, 14)
    val cat2 = seedCatalog()
    val s2 = new ForecastJob(cat2, 7).backtestUnioned(7, 3, 14)
    assert(s2.created.toSet == s1.created.toSet)
    assert(s2.successful.toSet == s1.successful.toSet)
    assert(s2.failedSeries == s1.failedSeries)
    for (t <- Seq("bucket_backtest_events", "bucket_backtest_plain_sales")) {
      val a = cat1.load(t).orderBy("metric", "cutoff").collect().toSeq
      val b = cat2.load(t).orderBy("metric", "cutoff").collect().toSeq
      assert(a == b, s"$t diverges between per-table and unioned backtest")
    }
  }

  test("rerun overwrites: outputs land in updated, row counts stable") {
    val cat = seedCatalog()
    new ForecastJob(cat, 7).run()
    val n1 = cat.load("bucket_forecast_events").count()
    val s2 = new ForecastJob(cat, 7).run()
    assert(s2.created.isEmpty)
    assert(s2.updated.toSet ==
      Set("bucket_forecast_events", "bucket_forecast_plain_sales"))
    assert(cat.load("bucket_forecast_events").count() == n1)
  }

  test("specificTables is exact-match (fs:231 substring quirk not ported)") {
    val cat = seedCatalog()
    // 'sales' is a substring of plain_sales; the reference would match it
    val s = new ForecastJob(cat, 7, specificTables = Some(Set("sales"))).run()
    assert(s.created.isEmpty && s.successful.isEmpty)
    val s2 = new ForecastJob(cat, 7, specificTables = Some(Set("plain_sales"))).run()
    assert(s2.created == Seq("bucket_forecast_plain_sales"))
  }

  test("forecast outputs are themselves skipped on rerun (fs:234)") {
    val cat = seedCatalog()
    new ForecastJob(cat, 7).run()
    val s2 = new ForecastJob(cat, 7).run()
    // no bucket_forecast_forecast_* tables appear
    assert(cat.listTables().forall(!_.startsWith("bucket_forecast_forecast")))
    assert(!s2.successful.exists(_.startsWith("bucket_forecast_")))
  }

  test("runUnioned produces identical outputs and bookkeeping to run()") {
    val catA = seedCatalog()
    val catB = seedCatalog()
    val sA = new ForecastJob(catA, 7).run()
    val sB = new ForecastJob(catB, 7).runUnioned()
    assert(sA.created.toSet == sB.created.toSet)
    assert(sA.successful.toSet == sB.successful.toSet)
    assert(sA.failedSeries.toSet == sB.failedSeries.toSet)
    Seq("bucket_forecast_events", "bucket_forecast_plain_sales").foreach { t =>
      val a = catA.load(t).orderBy("date").collect().map(_.toString).toSeq
      val b = catB.load(t).orderBy("date").collect().map(_.toString).toSeq
      assert(a == b, s"output $t differs between run() and runUnioned()")
    }
  }

  test("bucket_x vs x output-name collision: first runs, second is skipped") {
    val tmp = java.nio.file.Files.createTempDirectory("graftcoll").toString
    val cat = new ParquetCatalog(spark, tmp)
    val b = Bucketize.events(Fixtures.table(spark, sf0001, "events"))
    cat.writeTable("bucket_sales", b)
    cat.writeTable("sales", b)
    val s = new ForecastJob(cat, 7).run()
    assert(s.created == Seq("bucket_forecast_sales"))
    assert(s.skipped.exists { case (t, reason) =>
      t == "sales" && reason.contains("collides")
    })
  }

  test("parityTypes casts forecast columns back to source metric types (fs:135)") {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val cat = seedCatalog()
    new ForecastJob(cat, 7, parityTypes = true).run()
    val s = cat.load("bucket_forecast_events").schema
    // event_count/active_users are long in the source buckets -> long out
    assert(s("event_count").dataType == LongType)
    assert(s("event_count_min").dataType == LongType)
    assert(s("active_users_max").dataType == LongType)
    // value_sum is double in the source -> stays double
    assert(s("value_sum").dataType == DoubleType)
    // default (SURVEY §7.6): everything double
    val cat2 = seedCatalog()
    new ForecastJob(cat2, 7).run()
    assert(cat2.load("bucket_forecast_events").schema("event_count").dataType == DoubleType)
    // unioned path applies the same per-table source typing
    val cat3 = seedCatalog()
    new ForecastJob(cat3, 7, parityTypes = true).runUnioned()
    assert(cat3.load("bucket_forecast_events").schema("active_users").dataType == LongType)
  }

  test("only-future output has exactly interval rows per table") {
    val cat = seedCatalog()
    new ForecastJob(cat, 7, onlyFuture = true).run()
    assert(cat.load("bucket_forecast_events").count() == 7)
  }
}
