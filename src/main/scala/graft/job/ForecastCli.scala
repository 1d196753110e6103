package graft.job

import org.apache.spark.sql.SparkSession

import graft.catalog.ParquetCatalog

/** CLI mirroring the reference's positional contract
  * (forecast_script.py:251-267, README.md:5-13):
  *
  *   graft.job.ForecastCli <db_dir> <interval> [specific_tables]
  *       [--only-future] [--unioned] [--parity-types] [--backtest]
  *
  * `db_dir` is a directory of parquet tables (the "database");
  * `interval` is the forecast horizon in days; `specific_tables` is a
  * comma-separated allowlist matched EXACTLY (the reference's substring
  * quirk at fs:231 is not ported); `--only-future` keeps only
  * strictly-after-history rows (fs:176); `--unioned` fits the whole
  * database in one grouped shuffle instead of one Spark job per table;
  * `--parity-types` casts forecast columns back to each metric's source
  * type (the reference's fs:135 type re-use — truncating for int metrics);
  * `--backtest` (beyond-reference) runs rolling-origin cross-validation
  * instead of forecasting, with Prophet's default cutoff spacing derived
  * from the horizon (initial = 3 x horizon, period = horizon / 2
  * [public: prophet diagnostics defaults]), writing
  * `bucket_backtest_<t>` metric tables; combined with `--unioned` the
  * whole catalog cross-validates in one grouped shuffle.
  *
  * Infra parity (SURVEY.md §2.8): I2 — the top-level catch mirrors the
  * reference's global excepthook (fs:76-79); I4 — wall-clock summary.
  * I1 — log rotation is deployment config: see conf/log4j2-graft.properties
  * for the 50MB x 3 RollingFileAppender matching fs:59-64.
  */
object ForecastCli {

  def main(args: Array[String]): Unit =
    try {
      if (args.length < 2) {
        System.err.println(
          "usage: ForecastCli <db_dir> <interval> [specific_tables] [--only-future]")
        sys.exit(2)
      }
      val dbDir = args(0)
      val interval = args(1).toInt
      val rest = args.drop(2)
      val flags = Set("--only-future", "--unioned", "--parity-types", "--backtest")
      val onlyFuture = rest.contains("--only-future")
      val unioned = rest.contains("--unioned")
      val parityTypes = rest.contains("--parity-types")
      val backtest = rest.contains("--backtest")
      val specific = rest.filterNot(flags).headOption
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

      // spark-submit injects spark.master; fall back to local[*] when
      // launched as a plain JVM main (dev/test).
      val builder = SparkSession
        .builder()
        .appName("graft-forecast")
        .config("spark.sql.session.timeZone", "UTC")
      val spark =
        (if (sys.props.contains("spark.master")) builder
         else builder.master(sys.env.getOrElse("GRAFT_MASTER", "local[*]")))
          .getOrCreate()
      val job = new ForecastJob(new ParquetCatalog(spark, dbDir), interval, specific,
        onlyFuture, parityTypes)
      val summary =
        if (backtest && unioned)
          job.backtestUnioned(horizon = interval,
            period = math.max(1, interval / 2), initial = 3 * interval)
        else if (backtest)
          job.backtest(horizon = interval,
            period = math.max(1, interval / 2), initial = 3 * interval)
        else if (unioned) job.runUnioned()
        else job.run()
      println(
        f"${if (backtest) "backtest" else "forecast"} run finished in ${summary.wallSeconds}%.1f s: " +
          s"successful=${summary.successful.size} created=${summary.created.size} " +
          s"updated=${summary.updated.size} skipped=${summary.skipped.size} " +
          s"failedSeries=${summary.failedSeries.size}")
      spark.stop()
    } catch {
      case e: Throwable =>
        // global excepthook parity (fs:76-79): log, nonzero exit
        System.err.println(s"fatal: ${e.getMessage}")
        sys.exit(1)
    }
}
