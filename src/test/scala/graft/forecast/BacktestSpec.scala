package graft.forecast

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BacktestSpec extends SparkSpec {

  private def series(n: Int)(f: Int => Double): Array[(Long, Double)] = {
    val start = java.time.LocalDate.parse("2023-01-01").toEpochDay
    Array.tabulate(n)(i => (start + i, f(i)))
  }

  test("cutoff calendar: Prophet rule — last-horizon stepping back by period while initial holds") {
    val pts = series(30)(i => 10.0 + i)
    val rows = Backtest.backtestSeries("t", "m", pts,
      horizon = 7, period = 3, initial = 14).toSeq
    val start = pts.head._1
    // last = start+29; cutoffs 22, 19, 16, 13 (epoch-relative), ascending
    val wantCutoffs = Seq(13L, 16L, 19L, 22L).map(d =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(start + d)))
    assert(rows.map(_.cutoff) == wantCutoffs)
    assert(rows.forall(_.n == 7), s"dense series: every window has 7 test points")
  }

  test("near-zero error on a clean linear trend; coverage complete") {
    // the analytic pin on the fitted-model columns (mae/rmse/coverage are
    // not oracle-reachable — yhat needs the fit — so this property IS
    // their check): a pure trend has an exact in-model representation, so
    // per-cutoff error must be ridge-shrinkage-small relative to the
    // signal (y spans 10..70, slope 0.5/day), not merely "under 1"
    val pts = series(120)(i => 10.0 + 0.5 * i)
    val rows = Backtest.backtestSeries("t", "m", pts,
      horizon = 7, period = 7, initial = 60).toSeq
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.mae < 0.15, s"cutoff ${r.cutoff}: mae ${r.mae} on a clean trend")
      assert(r.rmse < 0.2, s"cutoff ${r.cutoff}: rmse ${r.rmse} on a clean trend")
      assert(r.rmse >= r.mae, "rmse >= mae always")
      assert(r.coverage == 1.0, s"clean-trend actuals must sit inside the band")
      // and the model must BEAT the seasonal naive here (skill, not luck:
      // on a slope the lag-7 naive is off by ~3.5 on average)
      assert(r.mae < r.mae_naive,
        s"cutoff ${r.cutoff}: model mae ${r.mae} not better than naive ${r.mae_naive}")
    }
  }

  test("no train/test leakage: a level shift after the cutoff must surprise the model") {
    // flat 50 for 60 days, then jumps to 150 — a fit that saw post-cutoff
    // data would track the jump and shrink the error
    val pts = series(67)(i => if (i < 60) 50.0 else 150.0)
    val rows = Backtest.backtestSeries("t", "m", pts,
      horizon = 7, period = 7, initial = 50).toSeq
    val atJump = rows.find(r =>
      r.cutoff.toLocalDate.toEpochDay == pts.head._1 + 59).getOrElse(
      fail(s"expected a cutoff right before the jump, got ${rows.map(_.cutoff)}"))
    assert(atJump.mae > 80.0,
      s"model predicted the unseen level shift (mae ${atJump.mae}) — training leaked")
  }

  test("seasonal-naive baseline: exact on a pure weekly pattern") {
    val pts = series(42)(i => Seq(10.0, 20, 30, 40, 50, 60, 70)(i % 7))
    val rows = Backtest.backtestSeries("t", "m", pts,
      horizon = 7, period = 7, initial = 21).toSeq
    assert(rows.nonEmpty)
    // y(d-7) reproduces a 7-periodic series exactly
    rows.foreach(r => assert(r.mae_naive == 0.0, s"naive mae ${r.mae_naive}"))
  }

  test("seasonal naive at horizon > 7 steps whole weeks back to the train side — no test-data reads") {
    // Linear series y(i) = i makes the two candidate baselines differ
    // loudly: for a test day d in the SECOND week after the cutoff, the
    // honest multi-step lag reads y(d-14) (error 14), while the leaky
    // plain d-7 lag would read y(d-7) — an ACTUAL inside the evaluation
    // window (error 7). Expected mae_naive over a 14-day horizon is
    // therefore (7*7 + 7*14)/14 = 10.5; the leaky implementation gives
    // 7.0. Pins the round-9 advice fix (Backtest.scala lag arithmetic).
    val pts = series(70)(i => i.toDouble)
    val rows = Backtest.backtestSeries("t", "m", pts,
      horizon = 14, period = 14, initial = 28).toSeq
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.n == 14, s"dense series: every window has 14 test points")
      assert(r.mae_naive == 10.5,
        s"cutoff ${r.cutoff}: mae_naive ${r.mae_naive} != 10.5 — the lag " +
          "read an actual from inside the evaluation window")
    }
  }

  test("fit-free naiveSeries projects exactly backtestSeries' (cutoff, n, mae_naive)") {
    val pts = series(70)(i =>
      30.0 + 0.4 * i + 4 * math.sin(2 * math.Pi * i / 7))
    Seq((7, 3, 14), (14, 14, 28)).foreach { case (h, p, ini) =>
      val full = Backtest.backtestSeries("t", "m", pts, h, p, ini)
        .map(r => (r.cutoff, r.n, r.mae_naive)).toSeq
      val naive = Backtest.naiveSeries("t", "m", pts, h, p, ini)
        .map(r => (r.cutoff, r.n, r.mae_naive)).toSeq
      assert(naive == full, s"(h=$h, p=$p, initial=$ini)")
    }
  }

  test("simulated band: deterministic metrics, coverage no worse than collapsed-band baseline") {
    val pts = series(90)(i => 30.0 + 0.4 * i + 4 * math.sin(2 * math.Pi * i / 7))
    val a = Backtest.backtestSeries("t", "m", pts, horizon = 7, period = 7,
      initial = 60, band = ForecastEngine.SimulatedBand(200)).toSeq
    val b = Backtest.backtestSeries("t", "m", pts, horizon = 7, period = 7,
      initial = 60, band = ForecastEngine.SimulatedBand(200)).toSeq
    assert(a == b, "seeded simulation must make backtest metrics rerun-stable")
    assert(a.nonEmpty)
    // same cutoffs and point errors as the analytic band (bands only
    // differ); coverage stays a valid fraction
    val an = Backtest.backtestSeries("t", "m", pts, horizon = 7, period = 7,
      initial = 60).toSeq
    assert(a.map(r => (r.cutoff, r.mae, r.rmse, r.mae_naive)) ==
      an.map(r => (r.cutoff, r.mae, r.rmse, r.mae_naive)))
    assert(a.forall(r => r.coverage >= 0.0 && r.coverage <= 1.0))
  }

  test("short or empty series yield no rows instead of throwing") {
    assert(Backtest.backtestSeries("t", "m", Array.empty,
      horizon = 7, period = 3, initial = 14).isEmpty)
    assert(Backtest.backtestSeries("t", "m", series(10)(_.toDouble),
      horizon = 7, period = 3, initial = 14).isEmpty)
  }

  test("crossValidate: distributed parity with the per-series form, one grouped map") {
    import spark.implicits._
    val pts = series(60)(i => 20.0 + 0.3 * i + 3 * math.sin(2 * math.Pi * i / 7))
    val long = pts.toSeq.map { case (d, y) =>
      ("tbl", "m1", java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d)), y)
    }.toDF("table", "metric", "ds", "y")
    val dist = Backtest.crossValidate(long, horizon = 7, period = 7, initial = 30)
    val local = Backtest.backtestSeries("tbl", "m1", pts,
      horizon = 7, period = 7, initial = 30).toSeq
    val got = dist.collect().sortBy(_.cutoff.getTime).toSeq
    assert(got == local)
    val plan = dist.queryExecution.optimizedPlan.toString
    assert(plan.contains("MapGroups"), "backtest must fan out as a grouped map")
  }

  test("crossValidate isolates a poisoned series: good series still reports") {
    import spark.implicits._
    val good = series(60)(i => 20.0 + i).toSeq.map { case (d, y) =>
      ("tbl", "ok", java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d)), y)
    }
    // all-NaN y rows are filtered upstream; this series ends up empty
    val bad = series(60)(_ => Double.NaN).toSeq.map { case (d, y) =>
      ("tbl", "poison", java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d)), y)
    }
    val long = (good ++ bad).toDF("table", "metric", "ds", "y")
    val out = Backtest.crossValidate(long, horizon = 7, period = 7, initial = 30)
      .collect()
    assert(out.nonEmpty && out.forall(_.metric == "ok"))
  }
}
