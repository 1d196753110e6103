package graft.operators

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, 10L + (i * 37) % 90)).toDF("id", "w")

  test("every doc lands in exactly one batch") {
    val in = docs(500)
    val packed = Packing.packGreedy(in, "id", "w", budget = 300, numPartitions = 4)
      .collect()
    assert(packed.length == 500)
    assert(packed.map(_.id).toSet == (0L until 500L).toSet)
  }

  test("no batch exceeds the budget unless it is a single oversized doc") {
    val in = docs(300).union(Seq((900L, 5000L)).toDF("id", "w")) // one oversized
    val packed = Packing.packGreedy(in, "id", "w", budget = 300, numPartitions = 4)
      .collect()
    packed.groupBy(p => (p.part_id, p.batch_idx)).foreach { case (k, b) =>
      val s = b.map(_.weight).sum
      assert(s <= 300 || b.length == 1, s"batch $k sum $s with ${b.length} docs")
    }
    // the oversized doc is kept, alone in its batch
    val over = packed.filter(_.id == 900L)
    assert(over.length == 1)
    assert(packed.count(p =>
      p.part_id == over.head.part_id && p.batch_idx == over.head.batch_idx) == 1)
  }

  test("batch indices are contiguous from 0 within each partition") {
    val packed = Packing.packGreedy(docs(400), "id", "w", budget = 250, numPartitions = 4)
      .collect()
    packed.groupBy(_.part_id).foreach { case (pid, rows) =>
      val idxs = rows.map(_.batch_idx).distinct.sorted.toSeq
      assert(idxs == (0 until idxs.length), s"partition $pid gaps: $idxs")
    }
  }

  test("deterministic across runs and input orderings") {
    val in = docs(400)
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packGreedy(df, "id", "w", budget = 250, numPartitions = 4)
        .collect().map(p => (p.id, p.part_id, p.batch_idx)).sortBy(_._1).toSeq
    val a = run(in)
    val b = run(in.orderBy($"id".desc)) // input order must not matter
    assert(a == b)
  }

  test("rejects non-positive budget and partitions") {
    intercept[IllegalArgumentException](
      Packing.packGreedy(docs(10), "id", "w", budget = 0, numPartitions = 4))
    intercept[IllegalArgumentException](
      Packing.packGreedy(docs(10), "id", "w", budget = 10, numPartitions = 0))
  }

  // ----- two-level prefix sum -----

  private def tokenDocs(n: Int) =
    (0 until n).map(i => (i.toLong * 3, 1L + (i * 53) % 200)).toDF("doc_id", "n")

  test("withOffsets matches a local exclusive cumsum at any bucket count") {
    val in = tokenDocs(300)
    val localCum = {
      val rows = in.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      rows.map { case (id, n) => val o = acc; acc += n; id -> o }.toMap
    }
    for (b <- Seq(1, 3, 17, 256)) {
      val got = Packing
        .withOffsets(in, Seq("doc_id"), "n",
          Packing.idRangeBucket(in, "doc_id", b))
        .select("doc_id", "off").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == localCum, s"nBuckets=$b")
    }
  }

  test("withKeyedOffsets matches per-key local cumsums at any bucket count, incl. one hot key") {
    // three keys with deliberate skew: key "a" owns ~90% of the rows (the
    // exact shape whose naive per-key window serializes)
    val in = (0 until 300).map { i =>
      val k = if (i % 10 == 0) (if (i % 20 == 0) "b" else "c") else "a"
      (i.toLong * 3, k, 1L + (i * 53) % 200)
    }.toDF("doc_id", "k", "n")
    val localCum = in.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2)
      .iterator
      .flatMap { case (_, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (id, _, n) => val o = acc; acc += n; id -> o }
      }
      .toMap
    for (b <- Seq(1, 3, 17, 256)) {
      val got = Packing
        .withKeyedOffsets(in, Seq("k"), Seq("doc_id"), "n",
          Packing.idRangeBucket(in, "doc_id", b))
        .select("doc_id", "off").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == localCum, s"nBuckets=$b")
    }
  }

  test("withOffsets on empty input yields an empty frame, no failure") {
    val in = tokenDocs(0)
    assert(Packing.withOffsets(in, Seq("doc_id"), "n",
      Packing.idRangeBucket(in, "doc_id", 8)).count() == 0)
  }

  test("packConcat drops zero-token docs rather than emitting corrupt segments") {
    val in = Seq((0L, 5L), (1L, 0L), (2L, 7L)).toDF("doc_id", "n")
    val segs = Packing.packConcat(in, 4, nBuckets = 2).collect()
    assert(!segs.map(_.getLong(1)).contains(1L), "zero-token doc must drop")
    assert(segs.map(r => r.getLong(5)).forall(_ > 0), "no empty segments")
    assert(segs.map(r => r.getLong(5)).sum == 12L)
  }

  // ----- concat-and-chunk packing -----

  test("packConcat: spans partition each doc and fill every sequence") {
    val in = tokenDocs(200)
    val ctx = 64
    val segs = Packing.packConcat(in, ctx, nBuckets = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byDoc = segs.groupBy(_._2)
    val nByDoc = in.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc covered exactly [0, n) by contiguous spans
    nByDoc.foreach { case (id, n) =>
      val spans = byDoc(id).sortBy(_._3).map(s => (s._3, s._4))
      assert(spans.head._1 == 0L && spans.last._2 == n, s"doc $id")
      spans.sliding(2).foreach {
        case Array((_, e), (b, _)) => assert(e == b, s"doc $id gap at $e")
        case _ =>
      }
    }
    // every sequence except the last is exactly full, none exceeds ctx
    val bySeq = segs.groupBy(_._1)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (sid, rows) =>
      val total = rows.map(_._6).sum
      if (sid != lastSeq) assert(total == ctx, s"seq $sid total $total")
      else assert(total <= ctx)
      // seq_off spans are disjoint and ordered by doc within the sequence
      val sorted = rows.sortBy(_._5)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 + a._6 == b._5, s"seq $sid overlap")
        case _ =>
      }
    }
    // total segment tokens == total input tokens
    assert(segs.map(_._6).sum == nByDoc.values.sum)
  }

  test("packConcat is bucket-count-independent") {
    val in = tokenDocs(150)
    def run(b: Int) = Packing.packConcat(in, 50, nBuckets = b)
      .orderBy("seq_id", "doc_id").collect().toSeq
    assert(run(1) == run(13) && run(13) == run(256))
  }

  test("packConcat rejects non-positive ctxLen") {
    intercept[IllegalArgumentException](Packing.packConcat(tokenDocs(5), 0))
  }

  // ----- deterministic shuffle order -----

  test("shuffleOrder emits a dense permutation ranked by (xxhash64, id)") {
    val in = (0 until 400).map(i => Tuple1(i.toLong * 7)).toDF("doc_id")
    val got = Packing.shuffleOrder(in).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.map(_._1).sorted.toSeq == (0L until 400L))
    // rank arithmetic must agree with a single global sort by (h, id)
    val expected = in
      .select($"doc_id", org.apache.spark.sql.functions.xxhash64($"doc_id").as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sortBy(identity).zipWithIndex
      .map { case ((_, id), pos) => pos.toLong -> id }.toMap
    assert(got.toMap == expected)
  }
}
