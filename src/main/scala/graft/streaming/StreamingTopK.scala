package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters per group via the Space-Saving summary
  * [public: Metwally, Agrawal, El Abbadi, "Efficient computation of
  * frequent and top-k elements in data streams", ICDT 2005] — the
  * streaming twin of the batch HeavyHitters operator (which uses the same
  * family of counters map-side, then recounts exactly; a stream cannot
  * recount, so the summary's error bound IS the contract here).
  *
  * State per group is a capacity-bounded counter map — fixed memory
  * forever, the property that lets the operator run on an unbounded
  * stream. An unseen item evicts the current minimum counter and inherits
  * its count as its error bound. Guarantees (per the paper):
  *   - any item with true count > n/capacity is in the summary;
  *   - for every tracked item: true <= est_count <= true + max_error.
  * Eviction ties break on item id, so the summary is deterministic for a
  * given arrival order.
  */
object StreamingTopK {

  final case class KeyedItem(group: String, item: Long)
  final case class TopKEntry(group: String, item: Long, est_count: Long, max_error: Long)

  def topK(
      events: Dataset[KeyedItem],
      capacity: Int,
      k: Int): Dataset[TopKEntry] = {
    require(capacity >= 1 && k >= 1 && k <= capacity)
    import events.sparkSession.implicits._
    events
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[KeyedItem], state: GroupState[Map[Long, (Long, Long)]]) =>
          // item -> (est_count, max_error); mutable inside the trigger,
          // immutable snapshot in the state store
          val m = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
          state.getOption.foreach(m ++= _)
          rows.foreach { r =>
            m.get(r.item) match {
              case Some((c, e)) => m(r.item) = (c + 1, e)
              case None if m.size < capacity => m(r.item) = (1L, 0L)
              case None =>
                val (minItem, (minC, _)) =
                  m.minBy { case (i, (c, _)) => (c, i) }
                m.remove(minItem)
                m(r.item) = (minC + 1, minC)
            }
          }
          state.update(m.toMap)
          m.toSeq
            .sortBy { case (i, (c, _)) => (-c, i) }
            .take(k)
            .iterator
            .map { case (i, (c, e)) => TopKEntry(g, i, c, e) }
      }
  }
}
