package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Token-budget batch packing for training-data assembly: group documents
  * into batches whose total token weight stays under a budget (the
  * sequence-packing step in front of an LLM trainer).
  *
  * Optimal bin packing is NP-hard and inherently serial; the scalable
  * compromise is greedy next-fit WITHIN each partition: documents are
  * hash-partitioned by id (so batch composition is independent of input
  * order and cluster layout — deterministic for a fixed partition count),
  * sorted by id within the partition, and packed by a single linear scan
  * per task. No shuffle beyond the one repartition, no driver-side state,
  * and each task's packing state is two integers — the shape that holds at
  * 100 TB. Next-fit wastes at most one under-filled batch per partition
  * versus first-fit-decreasing, which is noise once partitions hold
  * thousands of documents.
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
        col(weightCol).cast("long").as("weight"))
      .repartition(numPartitions, col("id"))
      .sortWithinPartitions("id")
      .as[(Long, Long)]
      .mapPartitions { rows =>
        val pid = TaskContext.getPartitionId()
        var batch = 0
        var acc = 0L
        rows.map { case (id, w) =>
          if (acc > 0 && acc + w > budget) { batch += 1; acc = 0L }
          acc += w
          PackedDoc(id, w, pid, batch)
        }
      }
  }
}
