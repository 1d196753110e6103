package graft.forecast

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Long -> wide pivot of forecast rows into the reference's output-table
  * layout (forecast_script.py:135,140-141,187-194): `date Date` then
  * `{m, m_min, m_max}` per metric, in source-metric order.
  */
object ForecastOutput {

  /** `metrics` is the full source metric list, passed explicitly so the
    * pivot (a) skips the extra distinct-scan job Spark otherwise runs and
    * (b) still emits (all-NULL) columns for metrics whose fit failed —
    * the reference's literal-NULL insert semantics (fs:208-210).
    *
    * Output typing defaults to DoubleType (SURVEY.md §7.6 decision). For
    * strict parity with the reference — which re-uses each source column's
    * type for all three forecast columns (forecast_script.py:135), so an
    * int-typed metric yields truncated int forecasts — pass `sourceTypes`:
    * metrics present in the map get `{m, m_min, m_max}` cast to their
    * source type; absent metrics keep DoubleType.
    */
  def toWide(
      fc: Dataset[ForecastRow],
      metrics: Seq[String],
      sourceTypes: Map[String, DataType] = Map.empty): DataFrame = {
    // group by (table, date), not date alone: a multi-table frame must
    // never merge same-named metrics across tables via first(); per-table
    // callers see identical output (table is dropped after the pivot),
    // misuse surfaces as visibly duplicated dates instead of silently
    // mixed values
    val wide = fc
      .groupBy(col("table"), col("date"))
      .pivot("metric", metrics)
      .agg(
        first(col("yhat")).as("v"),
        first(col("yhat_lower")).as("vmin"),
        first(col("yhat_upper")).as("vmax"))
    def typed(c: Column, m: String): Column =
      sourceTypes.get(m).map(c.cast).getOrElse(c)
    val ordered = col("date") +: metrics.flatMap { m =>
      Seq(
        typed(col(s"`${m}_v`"), m).as(m),
        typed(col(s"`${m}_vmin`"), m).as(s"${m}_min"),
        typed(col(s"`${m}_vmax`"), m).as(s"${m}_max"))
    }
    wide.drop("table").select(ordered: _*)
  }
}
