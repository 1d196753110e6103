package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel progression (ClickHouse `windowFunnel`'s streaming
  * twin; batch counterpart: RelationalQueries.funnelSteps).
  *
  * Explicit per-user state via flatMapGroupsWithState: state is just
  * (stage reached, event-time of that stage) — ~16 bytes per user, bounded
  * by the user population, not the event volume, which is what lets the
  * operator run forever on an unbounded stream.
  *
  * Semantics are the batch query's: stage k+1 is the first `steps(k+1)`
  * event STRICTLY after the time stage k was reached. Each micro-batch
  * sorts its own rows by event time (per user, in memory — micro-batch
  * sized, not corpus sized) and advances the state machine; a row is
  * emitted every time a user advances. State is monotone: an event older
  * than the reached stage can never regress it, so replays and duplicate
  * deliveries are idempotent. The one divergence from batch is inherent to
  * monotone streaming state: a LATE cross-batch event (an earlier stage-k
  * arriving after a later one was consumed) can't retroactively lower the
  * stage-k time, so a subsequent stage may be missed where a batch rerun
  * would count it — the same trade every watermarked streaming aggregate
  * makes.
  */
object StreamingFunnel {

  final case class FunnelEvent(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  final case class FunnelStage(user_id: Long, stage: Int, reached_at: java.sql.Timestamp)

  def stages(
      events: Dataset[FunnelEvent],
      steps: Seq[String]): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    val stepList = steps.toIndexedSeq // serializable, indexed closure copy
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[(Int, Long)]) =>
          var (stage, at) = state.getOption.getOrElse((0, Long.MinValue))
          val advanced = Seq.newBuilder[FunnelStage]
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            if (stage < stepList.size && e.event_type == stepList(stage) &&
                (stage == 0 || e.ts.getTime > at)) {
              stage += 1
              at = e.ts.getTime
              advanced += FunnelStage(uid, stage, e.ts)
            }
          }
          val out = advanced.result()
          if (out.nonEmpty) state.update((stage, at))
          out.iterator
      }
  }
}
