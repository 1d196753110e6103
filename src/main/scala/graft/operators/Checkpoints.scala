package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for the iterative operators ([[PageRank]],
  * [[Hits]], [[DedupClusters.connectedComponentsDF]], the LPA loop).
  *
  * Default (`reliable = false`): `localCheckpoint` — blocks live on the
  * executors that computed them. Fast (no FS round-trip) and right for
  * local mode, but on a real cluster a lost executor loses its blocks
  * and, with the lineage truncated, the whole iteration unwinds.
  *
  * `reliable = true`: `checkpoint` to the session's checkpoint directory
  * (call `sparkContext.setCheckpointDir` first — typically an HDFS/object
  * -store path). One write + read of the |V|-row score/label vector per
  * round — tiny next to the edge shuffle — buys executor-loss recovery
  * for long iterations on preemptible fleets.
  */
object Checkpoints {

  def truncate(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliable = true needs sparkContext.setCheckpointDir(<fault-tolerant path>)")
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
}
