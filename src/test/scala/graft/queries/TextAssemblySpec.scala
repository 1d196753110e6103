package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

/** Invariants for the training-example assembly queries that the DuckDB
  * hash compare can't express as properties (it only proves equality).
  */
class TextAssemblySpec extends SparkSpec {

  test("bpe_merge_round2: the learned merge is gone from the next round's pairs") {
    val top = TextQueries.bpeMergePairs(spark, sf0001)
      .limit(1).head.getString(0)
    val round2 = TextQueries.bpeMergeRound2(spark, sf0001).collect()
    assert(round2.nonEmpty)
    // every literal adjacency of the argmax pair was fused into one
    // symbol, so the pair itself cannot recur (a recurrence means the
    // merge was not applied, or applied after counting)
    assert(!round2.map(_.getString(0)).contains(top),
      s"round-1 argmax '$top' must not survive into round 2")
    // expanded fused symbols appear as longer-than-2-char pair strings —
    // evidence the sentinel expansion ran (the fixture's top pair recurs
    // adjacent to other symbols essentially always)
    assert(round2.exists(_.getString(0).length > 2),
      "expected at least one pair containing the fused symbol")
  }

  test("bpe_learn: dense ranks, sentinel-free expanded merges, round-1 agreement") {
    val merges = TextQueries.bpeLearn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(merges.map(_._1).toSeq == (1L to 8L))
    assert(merges.map(_._2).distinct.length == 8, "merge rules must be distinct")
    merges.foreach { case (rank, pair, cnt) =>
      assert(pair.length >= 2 && pair.forall(_ >= ' '),
        s"rank $rank: '$pair' must be fully expanded printable text")
      assert(cnt > 0)
    }
    // round 1 of the learner IS the standalone argmax query
    val top1 = TextQueries.bpeMergePairs(spark, sf0001).limit(1).head
    assert(merges.head._2 == top1.getString(0) &&
      merges.head._3 == top1.getLong(1))
  }

  test("bpe_compression: merges only ever shrink the symbol stream") {
    val r = TextQueries.bpeCompression(spark, sf0001).head
    val (before, after, ratio) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(before > after && after > 0)
    assert(ratio > 1.0)
    // mass baseline: chars_before is the wc-weighted char count of the
    // length>=2 word dictionary, independently recomputed
    val expected = Fixtures.table(spark, sf0001, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .agg(sum(length(col("w")))).head.getLong(0)
    assert(before == expected)
  }

  test("mix_execute: selection within availability, upsampled tails saturate") {
    val rows = TextQueries.mixExecute(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val counts = Fixtures.table(spark, sf001, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty && rows.map(_._1).distinct.size == rows.size)
    rows.foreach { case (lang, selected, target) =>
      assert(selected <= counts(lang), s"$lang over-selected")
      // tails upsampled past availability hit the fraction cap exactly
      if (target >= counts(lang)) assert(selected == counts(lang),
        s"$lang: saturated fraction must select every doc")
    }
  }

  test("pack_shard_manifest: dense full shards whose tokens add up") {
    val rows = TextQueries.packShardManifest(spark, sf001).collect()
    val ids = rows.map(_.getLong(0)).toSeq
    assert(ids == (0L until ids.length))
    rows.foreach { r =>
      val (sid, nSeqs, from, to) =
        (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5))
      assert(from >= sid * 64 && to <= sid * 64 + 63, s"shard $sid range")
      assert(nSeqs == to - from + 1, s"shard $sid sequence gaps")
      if (sid != ids.last) assert(nSeqs == 64, s"shard $sid not full")
    }
    // token payload conservation vs the corpus
    val total = Fixtures.table(spark, sf001, "documents")
      .select(graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(rows.map(_.getLong(3)).sum == total)
  }
}
