package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Token-budget batch packing for training-data assembly: group documents
  * into batches whose total token weight stays under a budget (the
  * sequence-packing step in front of an LLM trainer).
  *
  * Optimal bin packing is NP-hard and inherently serial; the scalable
  * compromise is greedy next-fit WITHIN each pack group: documents are
  * grouped by `id mod numPartitions` (an ENGINE-INDEPENDENT assignment —
  * batch composition depends only on (ids, weights, budget, count), not
  * on Spark's hash function, input order, or cluster layout, so an
  * external SQL engine can replay the exact packing), sorted by id within
  * the group, and packed by a single linear scan. One shuffle keyed on
  * the group label; a task may receive several groups (label-hash
  * collisions) — the scan resets its two-integer state at each group
  * boundary. Next-fit wastes at most one under-filled batch per group
  * versus first-fit-decreasing, which is noise once groups hold thousands
  * of documents.
  *
  * A single document heavier than the budget gets a batch of its own
  * (callers chunk oversized docs upstream; silently dropping them would
  * bias the corpus).
  */
object Packing {

  final case class PackedDoc(id: Long, weight: Long, part_id: Int, batch_idx: Int)

  def packGreedy(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      budget: Long,
      numPartitions: Int): Dataset[PackedDoc] = {
    require(budget > 0, "budget must be positive")
    require(numPartitions > 0, "numPartitions must be positive")
    import docs.sparkSession.implicits._
    docs
      .select(col(idCol).cast("long").as("id"),
        col(weightCol).cast("long").as("weight"),
        pmod(col(idCol).cast("long"), lit(numPartitions.toLong)).cast("int").as("part_id"))
      .repartition(numPartitions, col("part_id"))
      .sortWithinPartitions("part_id", "id")
      .as[(Long, Long, Int)]
      .mapPartitions { rows =>
        var cur = Int.MinValue
        var batch = 0
        var acc = 0L
        rows.map { case (id, w, p) =>
          if (p != cur) { cur = p; batch = 0; acc = 0L }
          else if (acc > 0 && acc + w > budget) { batch += 1; acc = 0L }
          acc += w
          PackedDoc(id, w, p, batch)
        }
      }
  }
}
