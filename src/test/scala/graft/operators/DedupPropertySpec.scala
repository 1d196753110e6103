package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property test over randomized corpora: the hash-keyed exact dedup must
  * be indistinguishable from the plain one on ANY input (including
  * corpora that are all duplicates, all unique, or single-doc), and both
  * must conserve the corpus: survivor count = distinct texts,
  * multiplicities sum to corpus size. Seed pinned like
  * ForecastPropertySpec; GRAFT_PROP_TESTS deepens the soak.
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, minTests: Int = 10): Unit = {
    val n = sys.env.get("GRAFT_PROP_TESTS").map(_.toInt).getOrElse(minTests)
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(org.scalacheck.rng.Seed(20260812L)), prop)
    assert(res.passed, res.status.toString)
  }

  private val corpusGen: Gen[List[(Long, String)]] = for {
    nDistinct <- Gen.choose(1, 40)
    texts <- Gen.listOfN(nDistinct,
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
    dupFactors <- Gen.listOfN(nDistinct, Gen.choose(1, 4))
  } yield texts.zip(dupFactors)
    .flatMap { case (t, k) => List.fill(k)(t) }
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("property: hash-keyed dedup == plain dedup; survivors conserve the corpus") {
    check(Prop.forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val plain = Dedup.exact(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val hashed = Dedup.exactHashKeyed(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val distinctTexts = corpus.map(_._2).distinct.size
      (plain == hashed) &&
        plain.map(_._2).sum == corpus.size &&
        plain.size == distinctTexts
    })
  }

  test("property: hashed substring spans == literal substring spans on any corpus") {
    // small windows over short random texts maximize shared-span odds;
    // the hashed form must group EXACTLY the spans the literal form does
    // (a rolling-recurrence bug or hash collision would break equality)
    check(Prop.forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      def groups(out: org.apache.spark.sql.DataFrame) =
        out.collect().map(_.getLong(1)).sorted.toSeq
      groups(Dedup.substringDupSpans(df, width = 3)) ==
        groups(Dedup.substringDupSpansHashed(df, width = 3))
    }, minTests = 6)
  }

  test("property: hashed span coverage == literal span coverage on any corpus") {
    // the hashed twin shares the literal form's driver oracle, so their
    // row-level equality on arbitrary corpora is load-bearing
    check(Prop.forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      def rows(out: org.apache.spark.sql.DataFrame) =
        out.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .sorted.toSeq
      rows(Dedup.substringDupCoverage(df, width = 3)) ==
        rows(Dedup.substringDupCoverageHashed(df, width = 3))
    }, minTests = 6)
  }
}
