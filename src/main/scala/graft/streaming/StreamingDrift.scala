package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming PSI drift monitor — the in-flight twin of the batch
  * `drift_psi` query ([[graft.queries.RelationalQueries.driftPsi]]): the
  * reference slice's (already Laplace-smoothed) bin distribution is
  * frozen into the plan as literals, and each event-time window scores
  * its own smoothed histogram against it as it closes. This is the
  * ML-ops shape — train-time feature distribution vs live traffic,
  * alerting on PSI — without a batch job rereading history.
  *
  * Scale/state: ONE watermarked stateful aggregation whose per-window
  * state is `nBins` longs (the histogram columns), retired when the
  * watermark passes the window end; the PSI arithmetic is a stateless
  * projection over those counts. No second stateful stage, no per-key
  * unbounded growth. The same code path works in batch (the watermark
  * degenerates to a no-op), which is what the stream ≡ batch spec
  * exploits.
  */
object StreamingDrift {

  final case class ValuePoint(ts: java.sql.Timestamp, value: Double)

  /** `reference`: one probability per bin (a distribution — smooth it
    * upstream the same way the window side smooths, or PSI is biased).
    * Output per window: window_start, n (raw count), psi (rounded 6).
    */
  def psi(points: Dataset[ValuePoint], reference: Seq[Double],
      binWidth: Double, nBins: Int = 10,
      windowDur: String = "1 day", watermarkDelay: String = "1 hour"): DataFrame = {
    require(reference.length == nBins, s"need $nBins reference probabilities")
    require(math.abs(reference.sum - 1.0) < 1e-6, "reference must sum to 1")
    require(binWidth > 0 && reference.forall(_ > 0),
      "positive bin width; strictly positive (smoothed) reference probs")
    val bin = least(lit(nBins - 1), greatest(lit(0),
      floor(col("value") / lit(binWidth)).cast("int")))
    val counts = (0 until nBins).map(i =>
      sum(when(bin === i, 1L).otherwise(0L)).as(s"c$i"))
    val agg = points.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(counts.head, counts.tail: _*)
    val total = (0 until nBins).map(i => col(s"c$i")).reduce(_ + _)
    def qq(i: Int) = (col(s"c$i") + lit(1L)) / (total + lit(nBins.toDouble))
    val psiExpr = (0 until nBins).map { i =>
      val p = lit(reference(i))
      (qq(i) - p) * log(qq(i) / p)
    }.reduce(_ + _)
    agg.select(col("w.start").as("window_start"), total.as("n"),
      round(psiExpr, 6).as("psi"))
  }
}
