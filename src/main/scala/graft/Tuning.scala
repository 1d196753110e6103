package graft

/** Size-adaptive session tuning shared by the Bench/Scaling harnesses.
  *
  * A fixed `spark.sql.shuffle.partitions = cores` is right at sf0.1 on
  * local[32] but starves replicated x10/x30 corpora (SCALING_x30_parts128:
  * dedup_embedding_lsh 116 s -> 32.8 s just from 32 -> 128 partitions).
  * On a real cluster the partition count grows with the data (or AQE
  * coalesces down from a high initial count); the harness mirrors that by
  * deriving the count from the input's on-disk bytes: one shuffle
  * partition per ~4 MB of PARQUET bytes — snappy parquet decompresses
  * and then explodes (shingles, candidate pairs) to roughly 8x its
  * on-disk size in the dedup/text family, so 4 MB on disk ~ the 32 MB
  * in-flight partition you actually want — floored at the core count
  * (never fewer tasks than cores), capped at 1024 (scheduling overhead
  * dominates beyond that in a single JVM). The x30 replica (458 MB on
  * disk) lands at ~115 partitions, squarely in the regime the round-7
  * parts-128 experiment measured as the fix. `SPARK_GRAFT_PARTS` still
  * overrides for controlled experiments.
  */
object Tuning {

  val TargetPartitionBytes: Long = 4L * 1024 * 1024

  def dirBytes(f: java.io.File): Long =
    if (f.isFile) f.length
    else Option(f.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)

  /** Shuffle-partition count for a dataset directory: env override if
    * set, else clamp(cores, inputBytes / 32 MB, 1024).
    */
  def shufflePartitionsFor(dir: String, cores: Int): Int =
    sys.env.get("SPARK_GRAFT_PARTS").map(_.toInt).getOrElse {
      val bytes = dirBytes(new java.io.File(dir))
      val byData = (bytes + TargetPartitionBytes - 1) / TargetPartitionBytes
      math.min(1024L, math.max(cores.toLong, byData)).toInt
    }
}
