package graft.operators

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate clustering: the near-dup PAIR list (from MinHash,
  * SimHash or exact Jaccard) is a graph; the deduplicated corpus keeps one
  * canonical document per connected component (A~B, B~C => A,B,C are one
  * cluster even if A,C never collided).
  *
  * Uses GraphX connected components — the iterative label-propagation is
  * Pregel-style and scales with edge count, exactly the right tool over
  * hand-rolled driver-side union-find (which would collect every pair).
  */
object DedupClusters {

  /** @param pairs near-dup pairs with long columns (`a`, `b`)
    * @return (doc_id, cluster_id) — cluster_id is the min doc_id of the
    *         component; docs absent from `pairs` are their own cluster and
    *         are NOT returned (callers left-join and coalesce to doc_id).
    */
  def connectedComponents(pairs: DataFrame, a: String = "doc_a", b: String = "doc_b"): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs
      .select(col(a).cast("long"), col(b).cast("long"))
      .as[(Long, Long)]
      .rdd
      .map { case (x, y) => Edge(x, y, ()) }
    val graph = Graph.fromEdges[Long, Unit](edges, defaultValue = 0L)
    // GraphX CC labels each vertex with the min vertex id of its component.
    // Pregel leaves the result graph's Edge/Vertex RDDs cached; eagerly
    // checkpoint the (small) label vector off them, then drop both graphs
    // so no GraphX-internal cache outlives the call (CacheHygieneSpec) —
    // the checkpoint blocks are GC-scoped, not session-scoped.
    val cc = graph.connectedComponents()
    val out = cc.vertices.toDF("doc_id", "cluster_id")
      .localCheckpoint(eager = true)
    cc.unpersist(blocking = false)
    graph.unpersist(blocking = false)
    out
  }

  /** DataFrame-native connected components: min-label propagation until
    * fixpoint. Each round is two keyed shuffles (neighbor-min aggregate +
    * label join) entirely inside Tungsten/AQE — no RDD conversion, unlike
    * the GraphX form, whose Pregel rounds run row-serialized and carry
    * fixed job-setup overhead per superstep. Converges in
    * graph-diameter rounds; near-dup clusters are shallow (a dup cluster
    * is nearly a clique), so 2-3 rounds is typical. Throws after
    * `maxIter` instead of returning a half-merged clustering. Each
    * round's labels are EAGERLY `localCheckpoint`ed: without lineage
    * truncation the label plan doubles per round (2^rounds nodes — a
    * plain persist keeps the full logical plan and OOMs the driver
    * around diameter ~10); checkpointing re-roots the plan at the
    * materialized RDD, the same trick GraphX's Pregel uses.
    *
    * Same contract as [[connectedComponents]]: (doc_id, cluster_id =
    * component min), only vertices present in `pairs`.
    */
  def connectedComponentsDF(
      pairs: DataFrame,
      a: String = "doc_a",
      b: String = "doc_b",
      maxIter: Int = 25,
      reliable: Boolean = false): DataFrame = {
    val edges = Checkpoints.truncate(pairs
      .select(col(a).cast("long").as("src"), col(b).cast("long").as("dst"))
      .union(pairs.select(col(b).cast("long").as("src"), col(a).cast("long").as("dst")))
      .distinct(), reliable)
    var labels = Checkpoints.truncate(edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id")), reliable)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("cluster")).as("nbr"))
      // carry the previous label through the checkpoint so the convergence
      // check is a filter over already-materialized rows, not another join
      val next = Checkpoints.truncate(
        labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select(col("id"),
            least(col("cluster"), coalesce(col("nbr"), col("cluster"))).as("cluster"),
            col("cluster").as("old")), reliable)
      changed = next.filter(col("cluster") =!= col("old")).count()
      labels.unpersist()
      labels = next.select("id", "cluster")
      i += 1
    }
    edges.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponentsDF did not converge in $maxIter rounds")
    labels.toDF("doc_id", "cluster_id")
  }

  /** Full dedup: drop exact copies (keep min doc_id per text), then drop
    * near-dup cluster non-canonicals. Returns the surviving documents.
    * `useGraphx = false` swaps in [[connectedComponentsDF]] — identical
    * output (the driver checks both against the same oracle).
    */
  def canonicalize(docs: DataFrame, pairs: DataFrame, useGraphx: Boolean = true): DataFrame = {
    val exactSurvivors = docs
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val clusters =
      if (useGraphx) connectedComponents(pairs) else connectedComponentsDF(pairs)
    docs
      .join(exactSurvivors, Seq("doc_id"), "left_semi")
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .filter(col("doc_id") === col("cluster_id"))
      .drop("cluster_id")
  }
}
