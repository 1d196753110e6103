package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CacheScope.Cacheable

/** Weighted PageRank by DataFrame power iteration [public: Page et al.
  * 1999; the GraphX/Pregel formulation re-expressed as joins so Catalyst
  * owns the physical plan].
  *
  * r_{t+1}(v) = (1-d) + d * sum over in-edges (u,v) of
  * r_t(u) * w(u,v) / W(u), where W(u) is u's total out-weight — the
  * unnormalized convention (ranks sum to |V|, not 1), matching GraphX's
  * `staticPageRank`.
  *
  * Scale shape: each iteration is ONE shuffle — a join of the (persisted,
  * out-weight-annotated) edge table against the current rank vector on
  * `src`, then a map-side-combinable sum keyed by `dst`. The rank vector
  * (|V| rows, two columns) is the only thing that changes per round, and
  * is `localCheckpoint`ed each iteration so the lineage stays one round
  * deep instead of `iters` joins deep (the same truncation discipline as
  * [[DedupClusters]]' min-label loop). Nothing ever collects to the
  * driver. Works unchanged on a 1000-executor cluster: the edge join
  * shuffles on `src`/`dst` only, and AQE handles hub-node skew the same
  * way it handles any skewed aggregation key.
  *
  * Dangling nodes (out-degree 0) contribute nothing and settle at 1-d;
  * callers wanting the strict "redistribute dangling mass" variant should
  * add a per-round scalar broadcast — deliberately omitted because the
  * driver-contract graph (a symmetrized bipartite graph) has none, and
  * the omission keeps the iteration a pure two-shuffle plan.
  *
  * The iteration count is FIXED (not convergence-tested): a deterministic
  * operator is oracle-able — [[oracleSql]] unrolls the same `iters`
  * rounds as plain chained CTEs, so DuckDB replays the identical
  * arithmetic and the driver hash-compares the result.
  */
object PageRank {

  /** edges: (src: long, dst: long, w: double). Returns (node, pr) with
    * `pr` rounded to 6 decimals (cross-engine float-sum tolerance).
    * `reliable` selects the lineage-truncation mode (see [[Checkpoints]]):
    * default executor-local; true = FS-backed, surviving executor loss.
    *
    * `redistributeDangling` enables the strict variant [public: Page et
    * al. 1999 §2.7's rank-sink fix]: each round, the rank mass sitting on
    * out-degree-0 nodes is summed (ONE broadcast one-row scalar — the
    * same crossJoin(broadcast(agg)) shape as the HITS normalizer) and
    * shared equally across all nodes, so total rank stays |V| instead of
    * leaking. Off by default: the driver-contract graph is symmetrized
    * (no dangling nodes) and the omission keeps the round a pure
    * two-shuffle plan.
    */
  def run(edges: DataFrame, iters: Int, damping: Double = 0.85,
      reliable: Boolean = false,
      redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.cacheTracked()
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val ew = e.join(outw, Seq("src"))
      .cacheTracked()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .cacheTracked()
    // dangling = nodes with no out-edges; tiny static frame, computed once
    val dangling =
      if (!redistributeDangling) null
      else nodes.join(e.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti")
        .cacheTracked()
    val nNodes = if (redistributeDangling) nodes.count().toDouble else 0.0
    var r = nodes.withColumn("r", lit(1.0))
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") * col("w") / col("ow")).as("c"))
      val next = nodes.join(contrib, Seq("node"), "left")
      r =
        if (!redistributeDangling)
          next.select(col("node"),
            (lit(1.0 - damping) + lit(damping) * coalesce(col("c"), lit(0.0))).as("r"))
        else {
          val dm = dangling.join(r, Seq("node"))
            .agg(coalesce(sum(col("r")), lit(0.0)).as("dm"))
          next.crossJoin(broadcast(dm))
            .select(col("node"),
              (lit(1.0 - damping) + lit(damping) *
                (coalesce(col("c"), lit(0.0)) + col("dm") / lit(nNodes))).as("r"))
        }
      r = Checkpoints.truncate(r, reliable)
    }
    r.select(col("node"), round(col("r"), 6).as("pr")).orderBy("node")
  }

  /** DuckDB oracle for [[run]] over an `edgesCte` (a CTE body that must
    * define `edges(src, dst, w double)`): the same fixed-point arithmetic
    * with one chained CTE pair per iteration — same association order
    * ((r * w) / ow; (1-d) + d * c), so the engines agree to float-sum
    * noise, absorbed by the ROUND(…, 6).
    */
  def oracleSql(edgesCte: String, iters: Int, damping: Double = 0.85,
      redistributeDangling: Boolean = false): String = {
    val base = edgesCte +
      ", outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY 1)" +
      ", nodes AS (SELECT DISTINCT src AS node FROM edges" +
      " UNION SELECT DISTINCT dst FROM edges)" +
      (if (redistributeDangling)
        ", dang AS (SELECT n.node FROM nodes n LEFT JOIN" +
          " (SELECT DISTINCT src FROM edges) o ON n.node = o.src" +
          " WHERE o.src IS NULL)" +
          ", nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nodes)"
      else "") +
      ", r0 AS (SELECT node, 1.0 AS r FROM nodes)"
    val rounds = (1 to iters).map { i =>
      val contrib =
        s", c$i AS (SELECT e.dst AS node, SUM(r.r * e.w / o.ow) AS c FROM edges e" +
          s" JOIN outw o ON e.src = o.src JOIN r${i - 1} r ON r.node = e.src GROUP BY 1)"
      if (!redistributeDangling)
        contrib +
          s", r$i AS (SELECT n.node, ${1.0 - damping} + $damping * COALESCE(c.c, 0) AS r" +
          s" FROM nodes n LEFT JOIN c$i c USING (node))"
      else
        contrib +
          // same association order as the Spark side:
          // (1-d) + d * (coalesce(c, 0) + dm / nn)
          s", d$i AS (SELECT COALESCE(SUM(r.r), 0) AS dm FROM dang g" +
          s" JOIN r${i - 1} r ON r.node = g.node)" +
          s", r$i AS (SELECT n.node, ${1.0 - damping} + $damping *" +
          s" (COALESCE(c.c, 0) + d.dm / nn.nn) AS r" +
          s" FROM nodes n LEFT JOIN c$i c USING (node) CROSS JOIN d$i d CROSS JOIN nn)"
    }.mkString
    s"WITH $base$rounds SELECT node, ROUND(r, 6) AS pr FROM r$iters ORDER BY node"
  }
}
