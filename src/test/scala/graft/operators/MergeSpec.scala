package graft.operators

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    ("k1", 5L, "base-new"),
    ("k2", 1L, "base-only"),
    ("k3", 2L, "base-old")
  ).toDF("k", "v", "payload")

  private val updates = Seq(
    ("k1", 3L, "upd-old"),    // older version than base's k1 row
    ("k3", 7L, "upd-new"),
    ("k4", 1L, "upd-only")
  ).toDF("k", "v", "payload")

  test("an update beats a base row for the same key even with an older version") {
    val out = Merge.upsert(base, updates, Seq("k"), Seq("v"))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map(
      "k1" -> "upd-old",   // incoming batch wins, not max-version
      "k2" -> "base-only",
      "k3" -> "upd-new",
      "k4" -> "upd-only"))
  }

  test("within one side, higher version wins; ties broken by later version cols") {
    val dups = Seq(
      ("k", 1L, 1L, "a"), ("k", 2L, 1L, "b"), ("k", 2L, 2L, "c")
    ).toDF("k", "v", "seq", "payload")
    val out = Merge.upsert(dups, dups.limit(0), Seq("k"), Seq("v", "seq"))
      .collect().map(_.getString(3)).toSeq
    assert(out == Seq("c"))
  }

  test("exactly one row per key, keys from both sides present") {
    val out = Merge.upsert(base, updates, Seq("k"), Seq("v"))
    assert(out.count() == 4)
    assert(out.select("k").distinct().count() == 4)
  }

  test("idempotent: re-applying the same update batch changes nothing") {
    val once = Merge.upsert(base, updates, Seq("k"), Seq("v"))
    val twice = Merge.upsert(once, updates, Seq("k"), Seq("v"))
    val a = once.collect().map(_.toSeq).toSet
    val b = twice.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("reserved internal names are rejected") {
    val bad = base.withColumn("__src", $"v")
    intercept[IllegalArgumentException](
      Merge.upsert(bad, updates, Seq("k"), Seq("v")))
    intercept[IllegalArgumentException](
      Merge.upsert(base, updates.withColumn("__rn", $"v"), Seq("k"), Seq("v")))
  }

  test("applyChanges: latest change decides — delete removes, later re-insert survives") {
    val changes = Seq(
      ("k1", 6L, "x", "d"),        // delete k1 (newer than base)
      ("k2", 2L, "re-ins", "u"),   // plain update
      ("k3", 5L, "x", "d"),        // delete k3 at v=5 ...
      ("k3", 8L, "back", "u"),     // ... but re-inserted at v=8 -> survives
      ("k5", 1L, "x", "d")         // delete of an absent key -> no row
    ).toDF("k", "v", "payload", "op")
    val out = Merge.applyChanges(base, changes, Seq("k"), Seq("v"))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map(
      "k2" -> "re-ins",
      "k3" -> "back"))
    assert(!out.contains("k1"), "deleted key must disappear")
    assert(!out.contains("k5"), "tombstone for an absent key adds nothing")
  }

  test("applyChanges: NULL op means upsert, never a silent tombstone") {
    val changes = Seq(
      ("k1", 9L, "null-op", null.asInstanceOf[String])
    ).toDF("k", "v", "payload", "op")
    val out = Merge.applyChanges(base, changes, Seq("k"), Seq("v"))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out("k1") == "null-op", s"null op must upsert, got $out")
    assert(out.keySet == Set("k1", "k2", "k3"))
  }

  test("applyChanges with no deletes degenerates to upsert") {
    val ch = updates.withColumn("op", org.apache.spark.sql.functions.lit("u"))
    val a = Merge.applyChanges(base, ch, Seq("k"), Seq("v"))
      .collect().map(_.toSeq).toSet
    val b = Merge.upsert(base, updates, Seq("k"), Seq("v"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
