package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

class MlPipelinesSpec extends SparkSpec {

  private lazy val emb = Fixtures.table(spark, sf0001, "embeddings")
  private lazy val docs = Fixtures.table(spark, sf0001, "documents")

  test("kmeans: every vector assigned, exactly k clusters, seeded rerun stable") {
    val a = MlPipelines.kmeansAssign(emb, k = 8)
    val n = emb.count()
    assert(a.count() == n)
    val clusters = a.select("cluster").distinct().count()
    assert(clusters == 8, s"expected 8 clusters, got $clusters")
    // same seed, same input -> same size multiset
    def sizes(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("cluster").count().collect().map(_.getLong(1)).sorted.toSeq
    assert(sizes(a) == sizes(MlPipelines.kmeansAssign(emb, k = 8)))
  }

  test("tfidf pipeline: norms positive, term counts match whitespace tokens, deterministic") {
    val f = MlPipelines.tfidfFeatures(docs).collect()
    assert(f.length == docs.count())
    assert(f.forall(_.getDouble(2) > 0.0), "every doc has a nonzero tfidf norm")
    // Tokenizer lowercases + splits on whitespace: n_terms matches a
    // direct split for a spot-checked doc
    val spot = docs.select(col("doc_id"),
      size(split(lower(col("text")), "\\s+")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    f.foreach(r => assert(r.getInt(1) == spot(r.getLong(0))))
    // hashing + idf are deterministic
    val again = MlPipelines.tfidfFeatures(docs).collect()
    assert(f.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
