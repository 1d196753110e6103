package graft.forecast

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Long -> wide pivot of forecast rows into the reference's output-table
  * layout (forecast_script.py:135,140-141,187-194): `date Date` then
  * `{m, m_min, m_max}` per metric, in source-metric order.
  */
object ForecastOutput {

  /** `metrics` is the full source metric list, passed explicitly so the
    * pivot (a) skips the extra distinct-scan job Spark otherwise runs and
    * (b) still emits (all-NULL) columns for metrics whose fit failed —
    * the reference's literal-NULL insert semantics (fs:208-210).
    * Output typing is always DoubleType (SURVEY.md §7.6 decision), not the
    * reference's cast-back-to-source-int coercion.
    */
  def toWide(fc: Dataset[ForecastRow], metrics: Seq[String]): DataFrame = {
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
    val ordered = col("date") +: metrics.flatMap { m =>
      Seq(
        col(s"`${m}_v`").as(m),
        col(s"`${m}_vmin`").as(s"${m}_min"),
        col(s"`${m}_vmax`").as(s"${m}_max"))
    }
    wide.drop("table").select(ordered: _*)
  }
}
