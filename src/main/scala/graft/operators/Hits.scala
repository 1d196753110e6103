package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CacheScope.Cacheable

/** HITS hubs-and-authorities on a weighted bipartite edge list [public:
  * Kleinberg 1999]. The natural companion to [[PageRank]] on
  * customer–supplier style graphs: hubs score the left side by how much
  * strong-authority weight they touch, authorities the right side
  * symmetrically.
  *
  * Iteration t: auth = E^T · hub, L2-normalize; hub = E · auth,
  * L2-normalize. Each half-round is ONE keyed aggregation over the
  * persisted edge list joined to the |V|-row score vector, plus a
  * one-row L2-norm aggregate broadcast back as a cross join — the same
  * bounded-scalar shape as every mean/total in this repo. Scores are
  * `localCheckpoint`ed per round (lineage one round deep, as
  * [[PageRank]]).
  *
  * Fixed iteration count keeps the operator deterministic, so
  * [[oracleSql]] can unroll the identical arithmetic (same association
  * order: SUM(score * w), then score / norm) as chained CTEs for the
  * driver's DuckDB hash compare.
  */
object Hits {

  /** edges: (c: long, s: long, w: double) — left node, right node,
    * weight. Returns (role: 'hub'|'auth', node, score) with score
    * rounded to 6 decimals; roles keep both sides in one frame.
    */
  def run(edges: DataFrame, iters: Int, reliable: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.cacheTracked()
    // Guarded normalizer: an all-zero (or empty-after-filter) edge frame
    // would otherwise divide by 0 and propagate NaN differently across
    // engines; clamping at MIN_NORMAL is identity for any real input.
    val minNorm = java.lang.Double.MIN_NORMAL
    var hub = e.select(col("c")).distinct().withColumn("h", lit(1.0))
    // Overwritten on the first (require-guaranteed) iteration; the init
    // value only exists so the frame is never null.
    var auth = e.select(col("s")).distinct().withColumn("a", lit(1.0))
    for (_ <- 1 to iters) {
      // truncate the edge-join AGGREGATE, not the normalized select: the
      // raw scores feed both the main plan and the broadcast L2-norm
      // subtree, so checkpointing here runs the expensive |E|-shuffle once
      // per half-round instead of twice (the normalizer and the division
      // then both read the |V|-row checkpoint; arithmetic is unchanged,
      // so the DuckDB unroll still hash-matches).
      val ar = Checkpoints.truncate(
        e.join(hub, Seq("c"))
          .groupBy(col("s")).agg(sum(col("h") * col("w")).as("a")),
        reliable)
      auth = ar
        .crossJoin(broadcast(ar.agg(sqrt(sum(col("a") * col("a"))).as("z"))))
        .select(col("s"), (col("a") / greatest(col("z"), lit(minNorm))).as("a"))
      val hr = Checkpoints.truncate(
        e.join(auth, Seq("s"))
          .groupBy(col("c")).agg(sum(col("a") * col("w")).as("h")),
        reliable)
      hub = hr
        .crossJoin(broadcast(hr.agg(sqrt(sum(col("h") * col("h"))).as("z"))))
        .select(col("c"), (col("h") / greatest(col("z"), lit(minNorm))).as("h"))
    }
    hub.select(lit("hub").as("role"), col("c").as("node"),
        round(col("h"), 6).as("score"))
      .union(auth.select(lit("auth"), col("s"), round(col("a"), 6)))
      .orderBy("role", "node")
  }

  /** DuckDB replay of [[run]] given `edgesCte` defining
    * `edges(c, s, w double)`.
    */
  def oracleSql(edgesCte: String, iters: Int): String = {
    val base = edgesCte +
      ", h0 AS (SELECT DISTINCT c, 1.0 AS h FROM edges)"
    val rounds = (1 to iters).map { i =>
      s", ar$i AS (SELECT s, SUM(h.h * e.w) AS a FROM edges e" +
        s" JOIN h${i - 1} h USING (c) GROUP BY s)" +
        s", a$i AS (SELECT s, a / GREATEST(z.z, 2.2250738585072014e-308) AS a FROM ar$i CROSS JOIN" +
        s" (SELECT SQRT(SUM(a * a)) AS z FROM ar$i) z)" +
        s", hr$i AS (SELECT c, SUM(a.a * e.w) AS h FROM edges e" +
        s" JOIN a$i a USING (s) GROUP BY c)" +
        s", h$i AS (SELECT c, h / GREATEST(z.z, 2.2250738585072014e-308) AS h FROM hr$i CROSS JOIN" +
        s" (SELECT SQRT(SUM(h * h)) AS z FROM hr$i) z)"
    }.mkString
    s"WITH $base$rounds " +
      s"SELECT 'hub' AS role, c AS node, ROUND(h, 6) AS score FROM h$iters " +
      s"UNION ALL SELECT 'auth', s, ROUND(a, 6) FROM a$iters ORDER BY role, node"
  }
}
