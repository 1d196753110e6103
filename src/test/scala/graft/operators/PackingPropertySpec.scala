package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property tests for concat-and-chunk packing: the distributed
  * two-level prefix-sum implementation must equal a trivially-correct
  * sequential reference on arbitrary (doc_id, tokens) sets, for any
  * context length and any bucket count — including zero-token docs
  * (dropped), ids with gaps, and docs spanning many windows.
  */
class PackingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, minTests: Int = 10): Unit = {
    val n = sys.env.get("GRAFT_PROP_TESTS").map(_.toInt).getOrElse(minTests)
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(org.scalacheck.rng.Seed(20260814L)), prop)
    assert(res.passed, res.status.toString)
  }

  /** Sequential reference: walk docs in id order, cut at ctx boundaries. */
  private def refSegments(docs: Seq[(Long, Long)], ctx: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    var off = 0L
    val b = Set.newBuilder[(Long, Long, Long, Long, Long, Long)]
    for ((id, n) <- docs.filter(_._2 > 0).sortBy(_._1)) {
      var s = off / ctx
      val last = (off + n - 1) / ctx
      while (s <= last) {
        val segB = math.max(off, s * ctx)
        val segE = math.min(off + n, (s + 1) * ctx)
        b += ((s, id, segB - off, segE - off, segB - s * ctx, segE - segB))
        s += 1
      }
      off += n
    }
    b.result()
  }

  private val docsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 60)
    ids <- Gen.listOfN(n, Gen.choose(0L, 5000L))
    lens <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.choose(1L, 300L), 1 -> Gen.const(0L)))
  } yield ids.distinct.zip(lens)

  test("packConcat equals the sequential reference for any input, ctx, buckets") {
    check(Prop.forAll(docsGen, Gen.choose(1, 64), Gen.choose(1, 32)) {
      (docs, ctx, buckets) =>
        val df = spark.createDataFrame(docs).toDF("doc_id", "n")
        val got = Packing.packConcat(df, ctx, nBuckets = buckets).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSet
        got == refSegments(docs, ctx)
    })
  }

  test("shuffleOrder is a dense permutation consistent with the (hash, id) sort") {
    val idsGen = Gen.choose(0, 50).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))
        .map(_.distinct))
    check(Prop.forAll(idsGen) { ids =>
      val df = ids.map(Tuple1(_)).toDF("doc_id")
      val got = Packing.shuffleOrder(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      val expected = df
        .select($"doc_id",
          org.apache.spark.sql.functions.xxhash64($"doc_id").as("h"))
        .collect().map(r => (r.getLong(1), r.getLong(0)))
        .sortBy(identity).zipWithIndex
        .map { case ((_, id), pos) => pos.toLong -> id }.toSet
      got.map(_._1).sorted.toSeq == ids.indices.map(_.toLong) &&
        got.toSet == expected
    })
  }
}
