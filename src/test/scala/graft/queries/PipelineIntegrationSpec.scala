package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, Sampling}

/** End-to-end pipeline invariants over the fixture corpus: the stages a
  * real curation run chains (dedup -> quality gate -> split ->
  * decontaminate) must compose — each query is oracle- or unit-checked
  * alone; this pins the cross-stage contracts.
  */
class PipelineIntegrationSpec extends SparkSpec {

  private lazy val docs = graft.sources.Fixtures.table(spark, sf0001, "documents")

  test("curation pipeline composes: survivors ⊆ corpus, splits partition survivors") {
    val curated = TextQueries.corpusCurate(spark, sf0001)
    val nCurated = curated.agg(sum("n_docs")).head().getLong(0)
    assert(nCurated > 0 && nCurated <= docs.count())
    // survivors of exact dedup, split three ways: disjoint and exhaustive
    val survivors = docs.join(
      Dedup.exact(docs).select("doc_id"), Seq("doc_id"), "left_semi")
    val split = Sampling.splitLabel(survivors, "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1))
    assert(split.count() == survivors.count())
    assert(split.select("doc_id").distinct().count() == survivors.count())
  }

  test("decontaminate flags exactly the test docs with heavy train overlap") {
    val flagged = DataQueries.decontaminate(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "fixture near-dups must cross the id-modulus split")
    // every flagged doc is in the test split by construction
    assert(flagged.forall(_ % 5 == 4))
    // and genuinely shares content: each flagged doc has a Jaccard
    // near-dup or exact-dup partner on the train side
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.3).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    val exactDupPartners = docs.as("a")
      .join(docs.as("b"), col("a.text") === col("b.text") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val partnered = (pairs ++ exactDupPartners)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val explained = flagged.count(d =>
      partnered.get(d).exists(_.exists(_ % 5 != 4)))
    assert(explained >= flagged.size / 2,
      s"only $explained of ${flagged.size} flagged docs have a visible train partner")
  }
}
