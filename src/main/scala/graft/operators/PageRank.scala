package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    */
  def run(edges: DataFrame, iters: Int, damping: Double = 0.85,
      reliable: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val ew = e.join(outw, Seq("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var r = nodes.withColumn("r", lit(1.0))
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") * col("w") / col("ow")).as("c"))
      r = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("c"), lit(0.0))).as("r"))
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
  def oracleSql(edgesCte: String, iters: Int, damping: Double = 0.85): String = {
    val base = edgesCte +
      ", outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY 1)" +
      ", nodes AS (SELECT DISTINCT src AS node FROM edges" +
      " UNION SELECT DISTINCT dst FROM edges)" +
      ", r0 AS (SELECT node, 1.0 AS r FROM nodes)"
    val rounds = (1 to iters).map { i =>
      s", c$i AS (SELECT e.dst AS node, SUM(r.r * e.w / o.ow) AS c FROM edges e" +
        s" JOIN outw o ON e.src = o.src JOIN r${i - 1} r ON r.node = e.src GROUP BY 1)" +
        s", r$i AS (SELECT n.node, ${1.0 - damping} + $damping * COALESCE(c.c, 0) AS r" +
        s" FROM nodes n LEFT JOIN c$i c USING (node))"
    }.mkString
    s"WITH $base$rounds SELECT node, ROUND(r, 6) AS pr FROM r$iters ORDER BY node"
  }
}
