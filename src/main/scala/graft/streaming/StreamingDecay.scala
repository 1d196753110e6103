package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exponentialMovingAverage + deltaSum — the unbounded-stream
  * twin of the batch `time_decay_agg` query
  * ([[graft.queries.AnalyticsQueries.timeDecayAgg]]). The batch form
  * computes the closed-form cumulative sum over the full history; a
  * stream cannot revisit history, so this carries the recurrence
  *   ema_i = y_i + ema_{i-1} * 2^(-(t_i - t_{i-1}) / halflife)
  * in per-key state — four numbers (last second, ema, last cents,
  * delta sum) plus a count, FIXED memory per key forever, which is what
  * lets it run on an unbounded stream. Algebraically identical to the
  * batch closed form (exponent addition); floating-point association
  * differs, so the stream ≡ batch test compares at 1e-6.
  *
  * Ordering contract: rows are sorted by (ts, event_id) WITHIN each
  * micro-batch; an event arriving in a later trigger with an earlier
  * timestamp than already-absorbed state is a LATE event and is folded
  * at its arrival position (decay exponent clamped at 0) rather than
  * retroactively — the standard monotone-state trade; feed the operator
  * through a watermark-sorted source when exact event-time order
  * matters. Timestamps truncate to whole epoch seconds and deltas use
  * integer cents, both matching the batch/oracle conventions.
  */
object StreamingDecay {

  final case class ValueEvent(
      user_id: Long, ts: java.sql.Timestamp, event_id: Long, value: Double)

  final case class DecayState(
      lastSec: Long, ema: Double, lastCents: Long, deltaSum: Long, n: Long)

  final case class DecayRow(
      user_id: Long, ema_last: Double, delta_sum: Double, n_events: Long)

  def emaDeltaSum(
      events: Dataset[ValueEvent],
      halflifeSec: Double = 86400.0): Dataset[DecayRow] = {
    require(halflifeSec > 0)
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (u: Long, rows: Iterator[ValueEvent], state: GroupState[DecayState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))
          var st = state.getOption.getOrElse(DecayState(0L, 0.0, 0L, 0L, 0L))
          sorted.foreach { r =>
            val sec = math.floorDiv(r.ts.getTime, 1000L)
            val cents = math.round(r.value * 100)
            if (st.n == 0L) st = DecayState(sec, r.value, cents, 0L, 1L)
            else {
              val dt = math.max(sec - st.lastSec, 0L) // late events: no negative decay
              val ema = st.ema * math.pow(2.0, -dt / halflifeSec) + r.value
              val d = math.max(cents - st.lastCents, 0L)
              st = DecayState(math.max(sec, st.lastSec), ema, cents,
                st.deltaSum + d, st.n + 1)
            }
          }
          state.update(st)
          Iterator.single(DecayRow(u, st.ema, st.deltaSum / 100.0, st.n))
      }
  }
}
