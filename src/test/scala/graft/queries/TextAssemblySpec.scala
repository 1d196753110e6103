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

  test("bpeSelectWave: greedy walk skips symbol-sharing pairs, keeps rank order") {
    val ranked = Seq(("ab", 100L), ("ac", 90L), ("cd", 80L), ("de", 70L),
      ("fg", 60L), ("gh", 50L))
    // ac shares 'a' with ab; de shares 'd' with cd; gh shares 'g' with fg
    assert(TextQueries.bpeSelectWave(ranked, 3) ==
      Seq(("ab", 100L), ("cd", 80L), ("fg", 60L)))
    // m larger than the disjoint supply: returns what exists
    assert(TextQueries.bpeSelectWave(ranked, 5) ==
      Seq(("ab", 100L), ("cd", 80L), ("fg", 60L)))
    // a self-pair uses one symbol and conflicts on it
    assert(TextQueries.bpeSelectWave(Seq(("aa", 9L), ("ba", 8L), ("cd", 7L)), 2) ==
      Seq(("aa", 9L), ("cd", 7L)))
  }

  test("bpe_learn_batched: batched == sequential on a tie-free disjoint-dominant fixture") {
    import spark.implicits._
    // isolated two-char words with distinct counts: every merge consumes
    // its whole word (which then drops from the learner dict), so no
    // merge can create or destroy another candidate's occurrences — the
    // regime where the non-conflicting-batch relaxation is EXACTLY
    // sequential BPE, per the scaladoc's equality claim
    val text = Seq("ab" -> 100, "cd" -> 90, "ef" -> 80, "gh" -> 70,
      "ij" -> 60, "kl" -> 50)
      .flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val docs = Seq(text).toDF("text")
    val (seqMerges, seqDict) =
      TextQueries.bpeRounds(TextQueries.bpeDictOf(docs), k = 4,
        keepSingles = false)
    val (batMerges, batDict, batWaves) =
      TextQueries.bpeRoundsBatched(TextQueries.bpeDictOf(docs), k = 4, m = 2,
        keepSingles = false)
    assert(batWaves == 2, "disjoint-dominant fixture fills k/m full waves")
    val seqRows = seqDict.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batRows = batDict.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    seqDict.unpersist(); batDict.unpersist()
    assert(seqMerges == batMerges,
      "merge tables (rank, expansion, count) must be identical")
    assert(seqMerges.map(_._2) == Seq("ab", "cd", "ef", "gh"))
    assert(seqRows == batRows, "final dictionaries must be identical")
  }

  test("batched BPE degrades gracefully under disjointness starvation " +
    "instead of aborting (the parallel-BPE failure mode)") {
    import spark.implicits._
    // a 3-symbol corpus: EVERY bigram over {a,b,c} shares a symbol with
    // every other (only 3 distinct symbols exist), so no wave can ever
    // select 2 disjoint pairs until merges mint new sentinel symbols —
    // the dense-symbol-graph regime a 2-full-wave test cannot surface.
    val text = (Seq.fill(40)("abc") ++ Seq.fill(30)("bca") ++
      Seq.fill(20)("cab") ++ Seq.fill(10)("aabb")).mkString(" ")
    val docs = Seq(text).toDF("text")
    val (merges, dict, waves) =
      TextQueries.bpeRoundsBatched(TextQueries.bpeDictOf(docs), k = 4, m = 4,
        keepSingles = false)
    dict.unpersist()
    // the k-merge contract holds despite starvation...
    assert(merges.size == 4)
    assert(merges.map(_._1) == Seq(1L, 2L, 3L, 4L), "ranks stay dense")
    assert(merges.forall(_._3 > 0), "every merge carries a positive count")
    // ...via MORE, SHORTER waves: wave 1 can take only 1 of the 4
    // requested pairs (all top candidates share symbols), so the run
    // must use >1 wave where an unstarved corpus would use exactly 1
    assert(waves > 1 && waves <= 4,
      s"starved run should shorten waves (got $waves waves for k=4, m=4)")
    // and the FIRST merge is still the global argmax — the short wave
    // takes the rank-order prefix, exactly sequential BPE's choice
    val (seqMerges, seqDict) =
      TextQueries.bpeRounds(TextQueries.bpeDictOf(docs), k = 1,
        keepSingles = false)
    seqDict.unpersist()
    assert(merges.head == seqMerges.head)
  }

  test("bpeSelectWave properties: rank-ordered, pairwise disjoint, greedy-maximal on random inputs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val pairGen = for {
      a <- Gen.alphaLowerChar; b <- Gen.alphaLowerChar
    } yield s"$a$b"
    val rankedGen = for {
      n <- Gen.choose(0, 40)
      ps <- Gen.listOfN(n, pairGen)
    } yield ps.distinct.zipWithIndex.map { case (p, i) => (p, (1000 - i).toLong) }
    val prop = Prop.forAll(rankedGen, Gen.choose(1, 8)) { (ranked, m) =>
      val sel = TextQueries.bpeSelectWave(ranked, m)
      val selSet = sel.map(_._1).toSet
      // at most m, all from the input, in rank order
      val rankOf = ranked.map(_._1).zipWithIndex.toMap
      val ordered = sel.map(p => rankOf(p._1)) == sel.map(p => rankOf(p._1)).sorted
      // pairwise symbol-disjoint
      val disjoint = sel.combinations(2).forall {
        case Seq((p, _), (q, _)) => p.toSet.intersect(q.toSet).isEmpty
        case _ => true
      }
      // greedy-maximal: every skipped higher-ranked candidate conflicts
      // with some selected pair ranked above it (when m not yet filled)
      val maximal = sel.size == m || ranked.forall { case (p, _) =>
        selSet.contains(p) ||
          sel.exists { case (q, _) =>
            rankOf(q) < rankOf(p) && p.toSet.intersect(q.toSet).nonEmpty }
      }
      sel.size <= m && ordered && disjoint && maximal
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200)
        .withInitialSeed(org.scalacheck.rng.Seed(20260815L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("bpe_learn_batched: dense expanded ranks; wave-1 head is the global argmax") {
    val merges = TextQueries.bpeLearnBatched(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(merges.map(_._1).toSeq == (1L to 8L))
    assert(merges.map(_._2).distinct.length == 8, "merge rules must be distinct")
    merges.foreach { case (rank, pair, cnt) =>
      assert(pair.length >= 2 && pair.forall(_ >= ' '),
        s"rank $rank: '$pair' must be fully expanded printable text")
      assert(cnt > 0)
    }
    // the first selection of wave 1 IS the global argmax — batching
    // never changes merge #1
    val top1 = TextQueries.bpeMergePairs(spark, sf0001).limit(1).head
    assert(merges.head._2 == top1.getString(0) &&
      merges.head._3 == top1.getLong(1))
    // within a wave the counts are measured on the SAME before-dict, so
    // they are non-increasing in rank inside each wave of 4
    assert(merges.slice(0, 4).map(_._3).sliding(2).forall(s => s(0) >= s(1)))
    assert(merges.slice(4, 8).map(_._3).sliding(2).forall(s => s(0) >= s(1)))
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

  test("mix_token_budget: budgets respected, greedy prefix tight, membership within corpus") {
    val rows = TextQueries.mixTokenBudget(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.nonEmpty && rows.map(_._1).distinct.size == rows.size)
    val byLang = Fixtures.table(spark, sf001, "documents")
      .select(col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .filter(col("n") > 0)
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"), sum("n").as("toks"), max("n").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.foreach { case (lang, nSel, tokSel, budget) =>
      val (docs, toks, mx) = byLang(lang)
      assert(tokSel <= budget, s"$lang over budget")
      assert(nSel <= docs && tokSel <= toks, s"$lang selected beyond corpus")
      // greedy-prefix tightness: either the whole language fit under its
      // budget, or the selection stops within one max-doc of the budget
      assert(tokSel == toks || budget - tokSel < mx,
        s"$lang: slack ${budget - tokSel} >= max doc $mx — prefix not greedy")
    }
    // tempered budgets sum to ~half the corpus tokens (rounding slack
    // bounded by one unit per language)
    val total = byLang.values.map(_._2).sum
    val budgetSum = rows.map(_._4).sum
    assert(math.abs(budgetSum - total / 2) <= rows.size,
      s"budgets $budgetSum vs half-corpus ${total / 2}")
  }

  test("mix_upsample: copy counts bracket the repeat factor; minority upsampled, majority thinned") {
    val rows = TextQueries.mixUpsample(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val counts = Fixtures.table(spark, sf001, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val wgts = counts.view.mapValues(n => math.pow(n / total, 0.7)).toMap
    val wsum = wgts.values.sum
    rows.foreach { case (lang, nRows, nDocs) =>
      val n = counts(lang)
      val r = math.round(wgts(lang) / wsum * total).toDouble / n
      // every doc emits floor(r) or floor(r)+1 copies
      assert(nRows >= nDocs * math.floor(r).toLong &&
        nRows <= nDocs * (math.floor(r).toLong + 1), s"$lang copies vs r=$r")
      assert(nDocs <= n)
      if (r >= 1.0) assert(nDocs == n,
        s"$lang: r=$r >= 1 must keep every distinct doc")
    }
    // the tempering moves mass toward minorities: smallest lang's rows
    // exceed its raw count, largest lang's fall below
    val smallest = counts.minBy(_._2)._1
    val largest = counts.maxBy(_._2)._1
    assert(rows.find(_._1 == smallest).get._2 > counts(smallest))
    assert(rows.find(_._1 == largest).get._2 < counts(largest))
  }

  test("curriculum_order: dense positions, bands descend along the order") {
    val rows = TextQueries.curriculumOrder(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L until rows.length))
    assert(rows.map(_._2).distinct.length == rows.length, "one position per doc")
    // quality bands are non-increasing along the training order
    rows.sliding(2).foreach { case Array((_, _, b1), (_, _, b2)) =>
      assert(b1 >= b2, s"band rose along the curriculum: $b1 -> $b2")
    case _ => ()
    }
    assert(rows.map(_._3).distinct.length > 1, "fixture must span bands")
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
