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
    // Materialize the pair list ONCE before handing it to GraphX:
    // Graph.fromEdges derives its vertex and edge RDDs independently
    // from the input RDD, so an unmaterialized `pairs` (typically the
    // full sketch pipeline — fingerprint, band join, distinct) executed
    // end-to-end TWICE (measured as two identical 1.7 s stages at
    // sf0.1). The eager localCheckpoint runs it once and re-roots the
    // lineage at the (small) materialized pair rows; the checkpoint
    // blocks are GC-scoped, same policy as the label vector below.
    val edges = pairs
      .select(col(a).cast("long"), col(b).cast("long"))
      .localCheckpoint(true)
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

  /** DataFrame-native connected components: FRONTIER-driven min-label
    * propagation until fixpoint, entirely inside Tungsten/AQE — no RDD
    * conversion, unlike the GraphX form, whose Pregel rounds run
    * row-serialized and carry fixed job-setup overhead per superstep.
    *
    * Round structure (the round-12 full-relabel loop re-cut after the
    * x30 study showed its per-round materialization dominating):
    *
    *  - Round 0 is FOLDED INTO INITIALIZATION: label(v) = min(v, direct
    *    neighbors of v) — one aggregate over the doubled edge frame
    *    replaces the first (join + aggregate + join) round outright.
    *  - Each subsequent round propagates only from the FRONTIER — the
    *    vertices whose label improved last round. Labels decrease
    *    monotonically, so a non-improved vertex has already offered its
    *    current label to every neighbor (at init, or the round after it
    *    last improved); re-offering cannot help. The per-round edge join
    *    is therefore keyed by a shrinking frontier (AQE broadcasts it
    *    once small) instead of re-joining every label to every edge,
    *    and convergence is "frontier empty" — no extra confirming
    *    full-relabel pass.
    *
    * Near-dup clusters are near-cliques: init alone labels a clique to
    * its min, one frontier round confirms quiescence — 1 materialized
    * round where the full-relabel loop paid 3. Long paths still take
    * diameter rounds (each round's frontier is the wavefront, so the
    * work per round is proportional to the wavefront, not |V|). Throws
    * after `maxIter` propagation rounds instead of returning a
    * half-merged clustering. Labels are EAGERLY `localCheckpoint`ed
    * per round: without lineage truncation the label plan doubles per
    * round (2^rounds nodes); checkpointing re-roots the plan at the
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
    // double the edges with ONE explode, not a self-union: `pairs` is
    // usually an unmaterialized sketch pipeline (banding, decode, CC
    // feeds), and a union of two copies of that plan executes the whole
    // pipeline twice before the checkpoint — the explode runs it once
    val edges = Checkpoints.truncate(pairs
      .select(explode(array(
        struct(col(a).cast("long").as("s"), col(b).cast("long").as("d")),
        struct(col(b).cast("long").as("s"), col(a).cast("long").as("d")))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
      .distinct(), reliable)
    // init = round 0: min over self and direct neighbors (every vertex
    // appears as src because the edge frame is doubled)
    var labels = Checkpoints.truncate(
      edges.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src").as("id"),
          least(col("src"), col("mn")).as("cluster")), reliable)
    // the init frontier: vertices whose label improved below their id —
    // a plain id-valued label was already seen by every neighbor's init
    // aggregate, an improved one has not been offered yet
    var frontier = labels.filter(col("cluster") < col("id"))
    var active = frontier.count()
    var i = 0
    while (active > 0 && i < maxIter) {
      val offers = edges
        .join(frontier.select(col("id").as("src"), col("cluster").as("c")), "src")
        .groupBy(col("dst")).agg(min(col("c")).as("nbr"))
      // carry the previous label through the checkpoint so the frontier
      // extraction is a filter over already-materialized rows
      val next = Checkpoints.truncate(
        labels.join(offers, labels("id") === offers("dst"), "left")
          .select(col("id"),
            least(col("cluster"), coalesce(col("nbr"), col("cluster"))).as("cluster"),
            col("cluster").as("old")), reliable)
      frontier = next.filter(col("cluster") =!= col("old")).select("id", "cluster")
      active = frontier.count()
      labels.unpersist()
      labels = next.select("id", "cluster")
      i += 1
    }
    edges.unpersist()
    if (active > 0)
      throw new IllegalStateException(
        s"connectedComponentsDF did not converge in $maxIter rounds")
    labels.toDF("doc_id", "cluster_id")
  }

  /** Connected components over a 64-bit perceptual-fingerprint corpus
    * (image dHash, audio energy-gradient prints), with the exact-first
    * collapse a fingerprint-dedup job always performs: identical
    * fingerprints form a group (representative = min id — a clique in
    * the pair graph, so collapsing cannot change components), the
    * pigeonhole banding ([[Dedup.hammingPairs]]) runs over DISTINCT
    * fingerprints only, CC runs on the group-representative graph, and
    * membership expands back at the end. The x30 study motivated this:
    * replicated media corpora carry ~7x fingerprint multiplicity, so
    * Hamming-0 pairs were ~77% of the edge set (1.56M of 2.0M) and the
    * CC paid for all of them; the collapsed graph has one vertex per
    * distinct fingerprint and only cross-fingerprint edges.
    *
    * Returns (`idCol`, cluster_id) for EVERY input id — singleton
    * fingerprints label themselves; callers filter to multi-member
    * clusters if that is the job's output. cluster_id is the min id of
    * the component, identical to running [[connectedComponentsDF]]
    * over the uncollapsed [[Dedup.hammingPairs]] pair set.
    */
  def fingerprintComponents(
      fp: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int): DataFrame = {
    val groups = Checkpoints.truncate(
      fp.groupBy(col(hashCol))
        .agg(min(col(idCol)).cast("long").as("gid")), reliable = false)
    val pairs = Dedup.hammingPairs(
      groups.select(col("gid"), col(hashCol)), "gid", hashCol, maxHamming)
    val cc = connectedComponentsDF(pairs)
      .withColumnRenamed("doc_id", "gid")
      .withColumnRenamed("cluster_id", "cid")
    val labeledGroups = groups.join(cc, Seq("gid"), "left")
      .select(col(hashCol), coalesce(col("cid"), col("gid")).as("cluster_id"))
    // `groups` stays localCheckpointed until GC — the returned plan is
    // lazy and still reads it (same block scope as the CC labels)
    fp.select(col(idCol), col(hashCol))
      .join(labeledGroups, hashCol)
      .select(col(idCol), col("cluster_id"))
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
