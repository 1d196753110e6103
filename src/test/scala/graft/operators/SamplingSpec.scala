package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Fixtures.table(spark, sf0001, "documents")

  test("splitLabel: disjoint, exhaustive, near the requested proportions") {
    val n = docs.count().toDouble
    val labeled = Sampling.splitLabel(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(labeled.count() == n.toLong, "every row labeled exactly once")
    val counts = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // binomial tolerance at n=500: 3 sigma of 0.8 is ~0.054
    assert(math.abs(counts("train") / n - 0.8) < 0.08, counts.toString)
    assert(math.abs(counts("val") / n - 0.1) < 0.06, counts.toString)
  }

  test("splitLabel is a pure function of (id, seed): stable under repartition and rerun") {
    def assign(df: org.apache.spark.sql.DataFrame) =
      Sampling.splitLabel(df, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = assign(docs)
    assert(assign(docs.repartition(13)) == base)
    assert(assign(docs.orderBy(col("doc_id").desc)) == base)
    // a different seed produces a genuinely different assignment
    val reseeded = Sampling.splitLabel(docs, "doc_id",
      Seq("a" -> 0.5, "b" -> 0.5), seed = 99L)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reseeded != base)
  }

  test("stratifiedSample keeps ~fraction per stratum and 0 for unlisted strata") {
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    val keep = langs.head
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang", Map(keep -> 0.5))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == Set(keep), "unlisted strata fully dropped")
    val total = docs.filter(col("lang") === keep).count().toDouble
    assert(math.abs(byLang(keep) / total - 0.5) < 0.2,
      s"kept ${byLang(keep)} of $total")
    // deterministic membership, not just deterministic counts
    val again = Sampling.stratifiedSample(docs, "doc_id", "lang", Map(keep -> 0.5))
    assert(again.select("doc_id").collect().map(_.getLong(0)).toSet ==
      out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("stratifiedExact: exactly min(k, stratum size) rows per stratum, stable membership") {
    val out = Sampling.stratifiedExact(docs, "doc_id", "lang", k = 7)
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == sizes.keySet, "every stratum represented")
    sizes.foreach { case (lang, n) =>
      assert(got(lang) == math.min(7L, n), s"$lang: got ${got(lang)} of $n")
    }
    // membership is a pure function of the ids — layout-independent
    val again = Sampling.stratifiedExact(docs.repartition(13), "doc_id", "lang", k = 7)
    assert(again.select("doc_id").collect().map(_.getLong(0)).toSet ==
      out.select("doc_id").collect().map(_.getLong(0)).toSet)
    // rn is 1..k dense within each stratum
    val rns = out.filter(col("lang") === sizes.keys.head)
      .select("rn").collect().map(_.getInt(0)).sorted
    assert(rns.sameElements(1 to rns.length))
  }

  test("splitLabelMd5: disjoint, exhaustive, stable, and seedless-deterministic") {
    val n = docs.count()
    def assign(df: org.apache.spark.sql.DataFrame) =
      Sampling.splitLabelMd5(df, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = assign(docs)
    assert(base.size == n, "every row labeled exactly once")
    assert(base.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(assign(docs.repartition(13)) == base, "stable under repartition")
    // the draw is md5 of the DECIMAL id string: pin one known assignment
    // so an accidental hash/format change can't slip through (md5("0")
    // = cfcd2084..., 0xcfcd20 / 2^24 = 0.8117 -> 'val' under 0.8/0.1/0.1)
    assert(base(0L) == "val", s"doc 0 drew ${base(0L)}")
  }

  test("splitLabel plans as a pure projection: no shuffle") {
    val p = Sampling.splitLabel(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"split must not shuffle\n$p")
  }
}
