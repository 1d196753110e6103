package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    ("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 5.0, 25.0), ("empty", 30.0, 30.0)
  ).toDF("name", "lo", "hi")

  test("binned range join == naive inequality join on boundary-heavy values") {
    val values = Seq(0.0, 5.0, 9.999, 10.0, 19.999, 20.0, 24.999, 25.0, 29.0, 31.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val binned = pairs(RangeJoin.binned(values, "v", intervals, "lo", "hi", binWidth = 4.0))
    val naive = pairs(values.join(intervals, col("v") >= col("lo") && col("v") < col("hi")))
    assert(binned == naive)
    // spot the semantics: hi exclusive, lo inclusive, empty interval dead
    assert(binned.contains((3L, "b")) && !binned.contains((3L, "a"))) // v=10.0
    assert(!binned.exists(_._2 == "empty"))
  }

  test("binned range join equivalence holds across bin widths") {
    val values = (0 until 200).map(i => (i.toLong, i * 0.37)).toDF("id", "v")
    val naive = values.join(intervals, col("v") >= col("lo") && col("v") < col("hi")).count()
    Seq(0.5, 3.0, 10.0, 100.0).foreach { w =>
      val n = RangeJoin.binned(values, "v", intervals, "lo", "hi", w).count()
      assert(n == naive, s"binWidth $w: $n != $naive")
    }
  }

  test("non-bin-granular doubles: no row lost to float boundary rounding") {
    // binWidth 0.1 is not exactly representable; deciding boundary-bin
    // exclusion via `hi % binWidth === 0` can disagree with the left
    // side's floor(v / binWidth) and silently drop matches. The fix
    // explodes one extra candidate bin and lets the exact predicate prune.
    val ivals = (0 until 30).map(i => (s"i$i", i * 0.1, (i + 3) * 0.1))
      .toDF("name", "lo", "hi")
    val values = (0 until 300).map(i => (i.toLong, i * 0.01)).toDF("id", "v")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val binned = pairs(RangeJoin.binned(values, "v", ivals, "lo", "hi", binWidth = 0.1))
    val naive = pairs(values.join(ivals, col("v") >= col("lo") && col("v") < col("hi")))
    assert(binned == naive)
  }

  test("the join is an equi-join on bins, not a nested loop") {
    val values = Seq((1L, 5.0)).toDF("id", "v")
    val p = RangeJoin.binned(values, "v", intervals, "lo", "hi", 4.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join must bin into an equi-join\n$p")
  }
}
