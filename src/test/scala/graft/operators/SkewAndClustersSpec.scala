package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain groupBy on a skewed key distribution") {
    // 90% of rows share one key — the skew scenario
    val df = ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 7}", i.toDouble))).toDF("k", "v")
    val salted = Skew.saltedAgg(df, Seq("k"),
      Map("s" -> ("v", "sum"), "n" -> ("v", "count"), "mx" -> ("v", "max")), salts = 8)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count("v").as("n"), max("v").as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (s, n, mx)) =>
      val (s2, n2, mx2) = salted(k)
      assert(math.abs(s - s2) < 1e-9 && n == n2 && mx == mx2, s"key $k")
    }
  }

  test("non-algebraic aggregate is rejected") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedAgg(df, Seq("k"), Map("bad" -> ("v", "avg")))
    }
  }

  test("salted join is row-identical to the plain inner join under skew") {
    // one hot key carrying 90% of the big side, plus unmatched keys on
    // both sides (inner-join semantics must drop them)
    val big = ((1 to 900).map(i => (1L, i.toDouble)) ++
      (1 to 100).map(i => ((i % 5 + 2).toLong, i.toDouble)) ++
      Seq((99L, 1.0))).toDF("k", "v")
    val small = (1L to 6L).map(k => (k, s"dim$k")).toDF("k", "name")
    val salted = Skew.saltedJoin(big, small, "k", salts = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    val plain = big.join(small, "k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    assert(salted.nonEmpty && !salted.exists(_._1 == 99L))
  }
}

class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("transitive near-dup pairs collapse into one component") {
    // A~B, B~C, D~E: components {1,2,3} and {7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val cc = DedupClusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) == cc(2L) && cc(2L) == cc(3L) && cc(1L) == 1L)
    assert(cc(7L) == cc(8L) && cc(7L) == 7L)
    assert(cc(1L) != cc(7L))
  }

  test("canonicalize keeps one doc per cluster and all singletons") {
    val docs = Seq(
      (1L, "near dup one"), (2L, "near dup two"), (3L, "near dup three"),
      (7L, "pair a"), (8L, "pair b"),
      (10L, "unique"), (11L, "copy"), (12L, "copy") // exact dups 11/12
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val kept = DedupClusters.canonicalize(docs, pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 7L, 10L, 11L))
  }

  test("fixture corpus: survivors = docs minus planted near-dup non-canonicals") {
    val docs = Fixtures.table(spark, sf0001, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5)
    val kept = DedupClusters.canonicalize(docs, pairs)
    val nonCanonical = DedupClusters.connectedComponents(pairs)
      .filter(col("doc_id") =!= col("cluster_id")).count()
    assert(kept.count() == docs.count() - nonCanonical)
  }

  test("DataFrame CC == GraphX CC on chains, a long path, and the fixture pairs") {
    def cc(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain + disjoint pair
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    assert(cc(DedupClusters.connectedComponentsDF(pairs)) ==
      cc(DedupClusters.connectedComponents(pairs)))
    // a 12-vertex path written high-to-low: min label must walk the full
    // diameter, exercising the iteration (not just one round)
    val path = (1 to 11).map(i => (12L - i, 12L - i + 1)).toDF("doc_a", "doc_b")
    val dfcc = cc(DedupClusters.connectedComponentsDF(path))
    assert(dfcc.values.toSet == Set(1L) && dfcc.size == 12)
    // real near-dup graph from the fixtures
    val jp = Dedup.ngramJaccardPairs(
      Fixtures.table(spark, sf0001, "documents"), 3, 0.5)
    assert(cc(DedupClusters.connectedComponentsDF(jp)) ==
      cc(DedupClusters.connectedComponents(jp)))
  }

  test("DataFrame CC fails loudly instead of returning a half-merged clustering") {
    val path = (1 to 11).map(i => (i.toLong, i.toLong + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      DedupClusters.connectedComponentsDF(path, maxIter = 2).collect()
    }
  }

  test("fingerprintComponents == CC over raw hammingPairs, incl. " +
    "multi-member identical-fingerprint groups with no near neighbor") {
    // fingerprints engineered so the collapse matters:
    //  - ids 1,2,3 share hash 0L (identical group, no outside neighbor)
    //  - ids 4,5 at hashes h,h^1 (Hamming 1 across DISTINCT hashes)
    //  - id 6 isolated (singleton fingerprint, no neighbor)
    //  - ids 7,8 identical AND id 9 within Hamming 2 of them (group
    //    bridged to an outside fingerprint)
    val h = 0x0F0F0F0F0F0F0F0FL
    val far = 0x123456789ABCDEFL
    val fp = Seq(
      (1L, 0L), (2L, 0L), (3L, 0L),
      (4L, h), (5L, h ^ 1L),
      (6L, far),
      (7L, -42L), (8L, -42L), (9L, -42L ^ 3L)
    ).toDF("media_id", "fph")
    val viaCollapse = DedupClusters
      .fingerprintComponents(fp, "media_id", "fph", maxHamming = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every id labels itself or its component min
    assert(viaCollapse == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
    // and the multi-member clusters equal CC over the RAW pair set
    val raw = DedupClusters.connectedComponentsDF(
      Dedup.hammingPairs(fp, "media_id", "fph", maxHamming = 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaCollapse.filter { case (id, c) =>
      viaCollapse.values.count(_ == c) >= 2 } == raw)
  }
}
