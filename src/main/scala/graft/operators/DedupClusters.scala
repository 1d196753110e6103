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
    // GraphX CC labels each vertex with the min vertex id of its component
    graph.connectedComponents().vertices
      .toDF("doc_id", "cluster_id")
  }

  /** Full dedup: drop exact copies (keep min doc_id per text), then drop
    * near-dup cluster non-canonicals. Returns the surviving documents.
    */
  def canonicalize(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val exactSurvivors = docs
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val clusters = connectedComponents(pairs)
    docs
      .join(exactSurvivors, Seq("doc_id"), "left_semi")
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .filter(col("doc_id") === col("cluster_id"))
      .drop("cluster_id")
  }
}
