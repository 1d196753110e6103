package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property tests for CDC apply: folding a chronologically-ordered change
  * stream batch by batch must reach the same table as applying it in one
  * batch — the invariant that makes micro-batched CDC ingestion sound.
  * (Chronological = every version in a later batch exceeds every version
  * in an earlier one for the stream, which is what a log-ordered CDC feed
  * guarantees; with cross-batch version ties the batch-wins rule takes
  * over and single-shot equivalence is not promised.)
  */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, minTests: Int = 10): Unit = {
    val n = sys.env.get("GRAFT_PROP_TESTS").map(_.toInt).getOrElse(minTests)
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(org.scalacheck.rng.Seed(20260813L)), prop)
    assert(res.passed, res.status.toString)
  }

  // a change row is (key, version, payload, op)
  private type Change = (String, Long, String, String)

  // a chronological change stream: versions strictly increase along the
  // stream; ~25% deletes; keys drawn from a small pool so collisions,
  // delete-then-reinsert, and repeated updates all occur
  private val streamGen: Gen[List[Change]] = for {
    n <- Gen.choose(0, 30)
    keys <- Gen.listOfN(n, Gen.choose(1, 8).map(i => s"k$i"))
    ops <- Gen.listOfN(n, Gen.frequency(3 -> Gen.const("u"), 1 -> Gen.const("d")))
  } yield keys.zip(ops).zipWithIndex.map { case ((k, op), i) =>
    (k, i.toLong + 1, s"p$i", op)
  }

  private val baseGen: Gen[List[(String, Long, String)]] = for {
    ks <- Gen.someOf(1 to 8)
  } yield ks.toList.map(i => (s"k$i", 0L, s"base$i"))

  private def tableOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq

  test("property: chronological batch folds converge to the single-shot apply") {
    check(Prop.forAll(baseGen, streamGen, Gen.choose(1, 5)) { (base, stream, nSplits) =>
      val baseDf = (("sentinel", -1L, "s") :: base)
        .toDF("k", "v", "payload")
        .filter($"v" >= 0L) // keeps the frame non-empty-schema-safe for empty bases
      def df(cs: List[Change]) = cs.toDF("k", "v", "payload", "op")
      val oneShot = tableOf(
        Merge.applyChanges(baseDf, df(stream), Seq("k"), Seq("v")))
      // fold the SAME stream in nSplits chronological chunks
      val chunkSize = math.max(1, math.ceil(stream.size.toDouble / nSplits).toInt)
      val folded = stream.grouped(chunkSize).foldLeft(baseDf) { (acc, chunk) =>
        Merge.applyChanges(acc, df(chunk), Seq("k"), Seq("v"))
      }
      tableOf(folded) == oneShot
    })
  }

  test("property: applied table never contains a key whose latest change is a delete") {
    check(Prop.forAll(baseGen, streamGen) { (base, stream) =>
      val baseDf = base.toDF("k", "v", "payload")
      val out = Merge.applyChanges(baseDf, stream.toDF("k", "v", "payload", "op"),
        Seq("k"), Seq("v"))
        .collect().map(_.getString(0)).toSet
      val lastOp = stream.groupBy(_._1).map { case (k, cs) => k -> cs.maxBy(_._2)._4 }
      lastOp.forall {
        case (k, "d") => !out.contains(k)
        case (k, _)   => out.contains(k)
      }
    })
  }
}
