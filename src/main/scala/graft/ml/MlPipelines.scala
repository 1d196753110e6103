package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{IDF, MinHashLSH}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-pipeline surface (BASELINE.json "MLlib pipelines + SparkSQL
  * aggregations"; SURVEY.md §7.5d): the places where the stock
  * distributed estimators are the right tool rather than a custom
  * operator. Both entry points are seeded and return plain DataFrames so
  * they compose with the rest of the query surface.
  *
  * Where this repo deliberately does NOT use MLlib, the reasons are
  * recorded at the site: ProphetLike needs a bespoke design matrix and
  * closed-form MAP solve (no MLlib equivalent), and the IVF coarse
  * quantizer keeps a hand-rolled Lloyd step because its codebook must
  * stay joinable mid-plan ([[graft.operators.Similarity.refineCentroids]]).
  */
object MlPipelines {

  /** Distributed k-means over the embeddings table: assembles the float
    * array into an ML vector, fits seeded KMeans (k-means|| init), and
    * returns per-vector cluster assignments. The fit is a handful of
    * treeAggregate passes over the corpus — each O(n x k x dim) map-side
    * work with a k x dim reduce payload, the textbook cluster-scalable
    * shape. Cluster IDs are arbitrary labels: stable for a fixed seed and
    * partitioning, but queries should aggregate to partition-independent
    * facts (sizes, inertia) rather than hash raw labels.
    */
  def kmeansAssign(emb: DataFrame, k: Int, seed: Long = 7L): DataFrame = {
    val feats = emb.select(col("vec_id"),
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(feats)
    model.transform(feats).select(col("vec_id"), col("prediction").as("cluster"))
  }

  /** Near-dup pairs via MLlib's MinHashLSH over hashed-shingle binary
    * vectors — the STOCK-ESTIMATOR twin of the hand-rolled
    * [[graft.operators.Dedup.minhashPairs]], registered so the two
    * independent MinHash implementations cross-validate at the driver
    * (the GraphX-vs-DataFrame CC precedent). `approxSimilarityJoin`
    * generates candidates from LSH bucket collisions (OR over
    * numTables), then its distance column is the EXACT Jaccard distance
    * between the candidate pair's feature vectors, so the output
    * threshold is exact-on-hashed-shingles (binary features at 2^18
    * bins — feature-hash collisions can merge shingles with probability
    * ~|shingles|/2^18 per doc). Featurization is
    * pmod(rolling_hash(shingle), 2^18) rather than HashingTF — equally
    * stateless (no vocabulary to collect), but the polynomial fold
    * replays in DuckDB where murmur3's Spark-internal byte path does
    * not, and MinHashLSH's own hash family is a seeded scala.util.Random
    * sequence the oracle builder regenerates in pure Scala — together
    * they put the WHOLE stock-estimator path under the driver's hash
    * compare. DedupSpec additionally bounds recall against the
    * df-capped exact operator.
    */
  def minhashLshPairs(
      docs: DataFrame,
      jaccardMin: Double = 0.5,
      numTables: Int = 8,
      seed: Long = 7L): DataFrame =
    minhashLshPairsFromSets(graft.operators.Dedup.shingleSets(docs, 3),
      jaccardMin, numTables, seed)

  /** [[minhashLshPairs]] over a pre-built
    * [[graft.operators.Dedup.shingleSets]] frame — the shared-
    * tokenization path dedup_recall threads through all five
    * shingle-based sketch pipelines.
    */
  def minhashLshPairsFromSets(
      sets: DataFrame,
      jaccardMin: Double = 0.5,
      numTables: Int = 8,
      seed: Long = 7L): DataFrame = {
    import graft.functions.RollingHashExpr
    val numFeatures = 1 << 18
    val sh = sets.select(col("doc_id"), col("sh").as("shingles"))
    val idx = sh.select(col("doc_id"),
      array_sort(array_distinct(transform(col("shingles"),
        s => pmod(RollingHashExpr.rolling_hash(s), lit(numFeatures.toLong)))))
        .as("idxs"))
    val toVec = udf((idxs: Seq[Long]) =>
      org.apache.spark.ml.linalg.Vectors.sparse(numFeatures,
        idxs.map(_.toInt).toArray, Array.fill(idxs.length)(1.0)))
    // feat is consumed THREE times (the fit pass + both sides of the
    // self-join), and the sparse-vector UDF is the pipeline's most
    // expensive per-row step — persist it (CacheScope-tracked, released
    // by the harness like every defensive cache) so the vectorization
    // runs once, the standard MLlib-LSH practice
    import graft.operators.CacheScope.Cacheable
    val feat = idx.select(col("doc_id"), toVec(col("idxs")).as("features"))
      .cacheTracked()
    val model = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numTables).setSeed(seed)
      .fit(feat)
    model.approxSimilarityJoin(feat, feat, 1.0 - jaccardMin, "dist")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
      .select(col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"),
        round(lit(1.0) - col("dist"), 6).as("jaccard_hashed"))
  }

  /** Hashed-TF -> stock IDF text featurization. The featurizer is
    * STATELESS like HashingTF (feature index = hash of the term — no
    * vocabulary to collect or broadcast, the property that makes it the
    * 100 TB featurizer) but hashes with the repo's polynomial rolling
    * hash instead of murmur3 — the same swap [[minhashLshPairs]] made,
    * and for the same reason: the fold replays in DuckDB where Spark's
    * internal murmur3 byte path does not, which puts the STOCK IDF
    * estimator (fit = one document-frequency aggregate; transform =
    * element-wise ln((m+1)/(df+1)) scaling) under the driver's hash
    * compare end to end. Tokenization is split-on-space of the lowered
    * text with empties dropped (replayable, unlike java split's
    * trailing-empty trim). Returns (doc_id, n_terms, tfidf_norm) — the
    * vector itself stays internal, the projection is what downstream
    * aggregations consume; the norm folds the dense array in ascending
    * index order so the oracle's ordered list_reduce matches bitwise.
    */
  def tfidfFeatures(docs: DataFrame, numFeatures: Int = 1 << 12): DataFrame = {
    import graft.functions.RollingHashExpr
    val terms = docs.select(col("doc_id"),
      filter(split(lower(col("text")), " "), t => length(t) > 0).as("terms"))
    val idx = terms.select(col("doc_id"), size(col("terms")).as("n_terms"),
      transform(col("terms"),
        t => pmod(RollingHashExpr.rolling_hash(t), lit(numFeatures.toLong))
          .cast("int")).as("idxs"))
    val toVec = udf((idxs: Seq[Int]) => {
      val counts = scala.collection.immutable.TreeMap.empty[Int, Double] ++
        idxs.groupBy(identity).map { case (i, xs) => i -> xs.size.toDouble }
      org.apache.spark.ml.linalg.Vectors
        .sparse(numFeatures, counts.keys.toArray, counts.values.toArray)
    })
    val feat = idx.select(col("doc_id"), col("n_terms"), toVec(col("idxs")).as("tf"))
    val model = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(feat)
    val normUdf = udf((v: org.apache.spark.ml.linalg.Vector) =>
      math.sqrt(v.toArray.foldLeft(0.0)((a, x) => a + x * x)))
    model.transform(feat)
      .select(col("doc_id"), col("n_terms"),
        round(normUdf(col("tfidf")), 6).as("tfidf_norm"))
  }
}
