package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — exact, O(|queries| x |corpus|);
  * fine when the query side is small and broadcastable. Scale path:
  * random-hyperplane LSH (SimHash for vectors [public: Charikar 2002])
  * with multiple tables; candidates share a bucket in >= 1 table, so the
  * join is keyed by (table, bucket) and never enumerates all pairs.
  */
object Similarity {

  /** Exact brute-force top-k by cosine for each query vector. The query
    * side is broadcast; corpus stays partitioned — the single window
    * ranks per query_id. Deterministic tie-break (cos DESC, vec_id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"),
      VectorFunctions.norm(col("embedding")).as("nrm"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      VectorFunctions.norm(col("embedding")).as("qnrm"))
    val scored = c
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        VectorFunctions.cosineWithNorms(col("embedding"), col("qe"), col("nrm"), col("qnrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
  }

  /** Deterministic random hyperplanes: `numTables` tables x `bitsPerTable`
    * planes, components from a seeded RNG; returns one bucket id per
    * (vector, table).
    */
  private def hyperplanes(dim: Int, numTables: Int, bitsPerTable: Int, seed: Long)
      : IndexedSeq[IndexedSeq[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    IndexedSeq.fill(numTables)(IndexedSeq.fill(bitsPerTable)(
      Array.fill(dim)(rng.nextGaussian())))
  }

  private def planeDotSign(v: Column, plane: Array[Double]): Column = {
    val planeCol = array(plane.toIndexedSeq.map(lit): _*)
    when(VectorFunctions.dot(v, planeCol) >= 0, 1L).otherwise(0L)
  }

  /** (vec_id, table, bucket) assignment — the shuffle key for candidate
    * generation. Bucket = sign-bit signature of the vector against that
    * table's hyperplanes.
    */
  def lshBuckets(emb: DataFrame, dim: Int, numTables: Int = 4, bitsPerTable: Int = 6,
      seed: Long = 7L): DataFrame = {
    val planes = hyperplanes(dim, numTables, bitsPerTable, seed)
    val tables = (0 until numTables).map { t =>
      val bucket = (0 until bitsPerTable)
        .map(b => planeDotSign(col("embedding"), planes(t)(b)) * (1L << b))
        .reduce(_ + _)
      struct(lit(t).as("tbl"), bucket.as("bucket"))
    }
    emb.select(col("vec_id"), col("embedding"), explode(array(tables: _*)).as("tb"))
      .select(col("vec_id"), col("embedding"), col("tb.tbl").as("tbl"),
        col("tb.bucket").as("bucket"))
  }

  /** IVF-style coarse quantization: `nCentroids` centroids chosen
    * deterministically from the corpus itself (every k-th vector by id
    * rank — a seeded stand-in for k-means; at real scale you'd run a few
    * Lloyd iterations with MLlib KMeans and broadcast the codebook).
    * Returns (vec_id, centroid_id) assignments — the partition key for
    * IVF search.
    */
  /** Deterministic codebook: the `nCentroids` corpus vectors with the
    * smallest id hash. orderBy+limit plans as a distributed top-k
    * (TakeOrderedAndProject) — no global sort — and hash-ordering makes
    * the pick independent of how ids are distributed (a vec_id-modulus
    * pick silently selects zero centroids on offset/sparse id spaces).
    */
  private[operators] def centroidsOf(corpus: DataFrame, nCentroids: Int): DataFrame =
    corpus
      .select(col("vec_id").as("centroid_id"), col("embedding").as("ce"))
      .orderBy(xxhash64(col("centroid_id")), col("centroid_id"))
      .limit(nCentroids)

  def ivfAssign(corpus: DataFrame, nCentroids: Int): DataFrame =
    ivfAssignTo(corpus, centroidsOf(corpus, nCentroids))

  /** Lloyd (k-means) refinement of an IVF codebook: `iters` rounds of
    * assign -> per-cell mean. Each round is distributed — an assignment
    * against the broadcast codebook plus one posexplode mean aggregation
    * keyed by (cell, dimension) — so the corpus is never collected. Only
    * the CODEBOOK (nCentroids x dim doubles) comes back to the driver per
    * round, truncating the iteration's lineage exactly like MLlib KMeans'
    * driver-resident centers; cells that lose all members keep their
    * previous centroid (the standard empty-cluster fallback). Better
    * centroids tighten cell radii, which is what makes low-nprobe IVF
    * recall work at scale.
    */
  def refineCentroids(corpus: DataFrame, initial: DataFrame, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    var cents = initial.select(col("centroid_id"), col("ce").cast("array<double>").as("ce"))
    for (_ <- 0 until iters) {
      val assign = ivfAssignTo(corpus, cents)
      val means = corpus.join(assign, "vec_id")
        .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("upd"))
      val next = cents.withColumnRenamed("ce", "prev")
        .join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"), coalesce(col("upd"), col("prev")).as("ce"))
      cents = spark.createDataFrame(
        java.util.Arrays.asList(next.collect(): _*), next.schema)
    }
    cents
  }

  /** Assignment against a precomputed broadcast codebook — callers that
    * also probe (ivfTopK) compute centroids once and reuse.
    */
  def ivfAssignTo(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist").asc, col("centroid_id"))
    corpus
      .join(broadcast(centroids))
      .withColumn("dist",
        VectorFunctions.dot(col("embedding"), col("embedding")) +
          VectorFunctions.dot(col("ce"), col("ce")) -
          lit(2.0) * VectorFunctions.dot(col("embedding"), col("ce")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("centroid_id"))
  }

  /** IVF ANN top-k: queries probe their own cell plus the `nprobe`-1 next
    * nearest centroids; candidates are corpus vectors assigned to probed
    * cells. Work per query is bounded by cell sizes, independent of the
    * corpus-wide pair count — the standard inverted-file trade of recall
    * for fan-out.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nprobe: Int = 4, refineIters: Int = 0): DataFrame = {
    // cached so assignment + probing share one codebook computation.
    // DELIBERATE cache scope: the returned plan is lazy so the operator
    // can't unpersist before consumption; Bench/Verify clearCache between
    // queries (nCentroids rows — negligible if a caller keeps it longer).
    val seed = centroidsOf(corpus, nCentroids)
    val centroids =
      (if (refineIters > 0) refineCentroids(corpus, seed, refineIters) else seed).cache()
    val assign = ivfAssignTo(corpus, centroids)
    val wq = Window.partitionBy(col("query_id")).orderBy(col("dist").asc, col("centroid_id"))
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .join(broadcast(centroids))
      .withColumn("dist", lit(-2.0) * VectorFunctions.dot(col("qe"), col("ce")) +
        VectorFunctions.dot(col("ce"), col("ce")))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= nprobe)
      .select(col("query_id"), col("qe"), col("centroid_id"))
    val cells = corpus.join(assign, "vec_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    cells
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", VectorFunctions.cosine(col("embedding"), col("qe")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
  }

  /** ANN top-k: candidates = corpus vectors sharing >= 1 (table, bucket)
    * with the query; exact cosine re-rank on candidates only. Candidates
    * per query is corpus_size / 2^bits x tables in expectation,
    * independent of the all-pairs count.
    *
    * Recall tuning: a neighbor at angle theta collides per bit with
    * probability 1 - theta/pi, per table with p = (1-theta/pi)^bits, and
    * is missed everywhere with (1-p)^tables. Top-k neighbors sit at
    * moderate angles (the fixtures' planted neighbors are cos ~ 0.45-0.5,
    * theta ~ 60 deg, per-bit ~ 0.66) — so defaults favor MORE tables with
    * FEWER bits than the near-dup case: 16 x 4 gives per-table ~ 0.19,
    * miss ~ 0.81^16 ~ 0.03 (the old 4 x 6 missed ~ 72% — measured 0.28
    * recall). At larger corpora raise bitsPerTable to shrink buckets and
    * numTables with it to hold recall; SimilaritySpec pins recall >= 0.8
    * against bruteForceTopK so a mistuned knob fails loudly.
    */
  /** Johnson-Lindenstrauss random projection [public: JL 1984; Achlioptas
    * 2003 database-friendly form]: seeded Gaussian matrix, rows scaled by
    * 1/sqrt(rDim) so dot products are approximately preserved in
    * expectation. Deterministic for a fixed seed — the compression twin
    * of int8 quantization (fewer dimensions vs fewer bits/dimension).
    */
  def randomProject(emb: DataFrame, dim: Int, rDim: Int, seed: Long = 11L): DataFrame = {
    require(rDim >= 1 && rDim <= dim, "rDim must be in [1, dim]")
    val rng = new scala.util.Random(seed)
    val mat = IndexedSeq.fill(rDim)(
      Array.fill(dim)(rng.nextGaussian() / math.sqrt(rDim.toDouble)))
    val comps = mat.map(row =>
      VectorFunctions.dot(col("embedding"), array(row.toIndexedSeq.map(lit): _*)).cast("float"))
    emb.select(col("vec_id"), array(comps: _*).as("embedding"))
  }

  /** Top-k through the projection: coarse top-(k x oversample) in the
    * rDim-dimensional space (dot products cost rDim, not dim — the scan
    * over the corpus is dim/rDim cheaper and the projected corpus is
    * dim/rDim smaller at rest), then EXACT re-rank of those candidates on
    * the original vectors. Same candidate-then-verify shape as the LSH and
    * IVF paths; the projection error only costs recall, never a wrong
    * final cosine.
    *
    * Applicability: inner-product error after JL is ~1/sqrt(rDim), so RP
    * helps exactly when the neighbor-vs-bulk cosine GAP exceeds that —
    * high-dim embeddings with clear near-dups (a 768d->64d scrub of
    * cos>0.9 duplicates), not small-margin ranking. On the 64d fixtures
    * (0.45-vs-0.35 margins, below the rDim=32 error) measured recall is
    * 0.46 — the documented wrong regime; SimilaritySpec pins recall >=0.9
    * on planted high-margin neighbors where the method applies.
    */
  def rpTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int,
      rDim: Int = 32, oversample: Int = 8, seed: Long = 11L): DataFrame = {
    val coarse = bruteForceTopK(
        randomProject(corpus, dim, rDim, seed),
        randomProject(queries, dim, rDim, seed), k * oversample)
      .select(col("query_id"), col("vec_id"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    coarse
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(q), "query_id")
      .withColumn("cos", VectorFunctions.cosine(col("embedding"), col("qe")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int,
      numTables: Int = 16, bitsPerTable: Int = 4, seed: Long = 7L): DataFrame = {
    val cb = lshBuckets(corpus, dim, numTables, bitsPerTable, seed)
    val qb = lshBuckets(queries, dim, numTables, bitsPerTable, seed)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("tbl"), col("bucket"))
    val cand = cb.join(broadcast(qb),
        cb("tbl") === qb("tbl") && cb("bucket") === qb("bucket") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("embedding"), col("qe"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    cand
      .withColumn("cos", VectorFunctions.cosine(col("embedding"), col("qe")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
  }
}
