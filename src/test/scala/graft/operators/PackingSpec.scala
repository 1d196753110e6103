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
}
