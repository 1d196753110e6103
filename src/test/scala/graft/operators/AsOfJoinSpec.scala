package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("strictly-before semantics: same-day right value is not visible") {
    val left = Seq(
      ("k1", "2024-01-01", 100L),
      ("k1", "2024-01-02", 101L),
      ("k1", "2024-01-03", 102L),
      ("k2", "2024-01-02", 200L)
    ).toDF("k", "t", "id")
    val right = Seq(
      ("k1", "2024-01-01", 1.0),
      ("k1", "2024-01-02", 2.0),
      ("k2", "2024-01-01", 9.0)
    ).toDF("k", "t", "v")
    val out = AsOfJoin.joinStrictlyBefore(left, right,
      keys = Seq("k"), leftTime = "t", rightTime = "t", values = Seq("v"))
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(100L).isEmpty)          // nothing before Jan 1
    assert(out(101L).contains(1.0))    // sees Jan 1, not same-day Jan 2
    assert(out(102L).contains(2.0))    // latest strictly before Jan 3
    assert(out(200L).contains(9.0))    // keys do not bleed
  }

  test("a genuinely-null newer right value is carried, not skipped for a stale one") {
    val left = Seq(("k", "2024-01-03", 1L)).toDF("k", "t", "id")
    val right = Seq(
      ("k", "2024-01-01", Option(5.0)),
      ("k", "2024-01-02", Option.empty[Double])
    ).toDF("k", "t", "v")
    val out = AsOfJoin.joinStrictlyBefore(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("v").head()
    assert(out.isNullAt(0), "must match the Jan 2 row (NULL), like ASOF JOIN")
  }

  test("inclusive match: a same-instant right row is visible (ASOF >= semantics)") {
    val left = Seq(("k", "2024-01-02", 1L)).toDF("k", "t", "id")
    val right = Seq(("k", "2024-01-02", 2.0), ("k", "2024-01-01", 1.0)).toDF("k", "t", "v")
    val strict = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("v").head()
    val incl = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "t", Seq("v"), strict = false)
      .select("v").head()
    assert(strict.getDouble(0) == 1.0, "strict: same-day value hidden")
    assert(incl.getDouble(0) == 2.0, "inclusive: same-day value matches")
  }

  test("forward direction matches the nearest at-or-after right row") {
    val left = Seq(("k", "2024-01-02", 1L), ("k", "2024-01-05", 2L)).toDF("k", "t", "id")
    val right = Seq(
      ("k", "2024-01-01", 1.0), ("k", "2024-01-03", 3.0), ("k", "2024-01-04", 4.0)
    ).toDF("k", "t", "v")
    val out = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "t", Seq("v"),
      direction = AsOfJoin.Forward)
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(out(1L).contains(3.0), "nearest strictly-after Jan 2 is Jan 3")
    assert(out(2L).isEmpty, "nothing after Jan 5")
  }

  test("tolerance nulls out matches farther than the window") {
    val left = Seq(("k", "2024-01-10", 1L), ("k", "2024-01-02", 2L)).toDF("k", "t", "id")
    val right = Seq(("k", "2024-01-01", 1.0)).toDF("k", "t", "v")
    val out = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "t", Seq("v"),
      toleranceSeconds = Some(2L * 86400))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(out(2L).contains(1.0), "1 day back: inside the 2-day tolerance")
    assert(out(1L).isEmpty, "9 days back: outside tolerance -> NULL")
  }

  test("reserved internal column names are rejected on either input") {
    val left = Seq(("k", "2024-01-01", 1L)).toDF("k", "t", "id")
    val right = Seq(("k", "2024-01-01", 1.0)).toDF("k", "t", "v")
    Seq("__t", "__tag", "__isleft", "__vals", "__rt", "__carried").foreach { bad =>
      val l = left.withColumn(bad, left("id"))
      val e1 = intercept[IllegalArgumentException] {
        AsOfJoin.joinStrictlyBefore(l, right, Seq("k"), "t", "t", Seq("v"))
      }
      assert(e1.getMessage.contains(bad))
      val r = right.withColumn(bad, right("v"))
      val e2 = intercept[IllegalArgumentException] {
        AsOfJoin.joinStrictlyBefore(left, r, Seq("k"), "t", "t", Seq("v"))
      }
      assert(e2.getMessage.contains(bad))
    }
  }

  test("left row count preserved (left-join semantics)") {
    val left = (1 to 50).map(i => ("k", f"2024-02-$i%02d".take(10), i.toLong))
      .filter(_._2.matches("2024-02-(0[1-9]|1[0-9]|2[0-8])")).toDF("k", "t", "id")
    val right = Seq(("k", "2024-02-10", 1.0)).toDF("k", "t", "v")
    val out = AsOfJoin.joinStrictlyBefore(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(out.count() == left.count())
  }
}
