package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[ExactQuantile.interp]] against a direct Scala rendering of the
  * type-7 formula, and the Spark/SQL mirror pair against each other: the
  * correctness strategy leans on both sides computing the SAME
  * interpolation, so a drift in either rendering must fail here before it
  * surfaces as an oracle hash flip.
  */
class ExactQuantileSpec extends SparkSpec {
  import spark.implicits._

  /** Reference type-7: h = p(n-1), v[floor(h)] + (h-floor(h))(v[floor(h)+1]-v[floor(h)]). */
  private def ref(sorted: Seq[Long], p: Double): Double = {
    val n = sorted.length
    val h = p * (n - 1)
    val lo = sorted(math.floor(h).toInt).toDouble
    val hi = sorted(math.min(math.floor(h).toInt + 1, n - 1)).toDouble
    lo + (h - math.floor(h)) * (hi - lo)
  }

  private def sparkInterp(sorted: Seq[Long], p: Double): Double =
    Seq(Tuple1(sorted)).toDF("v")
      .select(ExactQuantile.interp(col("v"), size(col("v")), p).as("q"))
      .head().getDouble(0)

  test("interp matches the reference type-7 formula bit-for-bit") {
    val rng = new scala.util.Random(42)
    val arrays = Seq(
      Seq(7L),
      Seq(1L, 2L),
      Seq(100L, 200L, 300L, 400L),
      Seq.fill(17)(rng.nextInt(100000).toLong).sorted,
      Seq.fill(64)(rng.nextInt(1000).toLong).sorted)
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    for (a <- arrays; p <- ps) {
      val got = sparkInterp(a, p)
      val want = ref(a, p)
      assert(java.lang.Double.doubleToLongBits(got)
        == java.lang.Double.doubleToLongBits(want),
        s"p=$p over n=${a.length}: $got != $want")
    }
  }

  test("interp endpoints are the array min/max exactly") {
    val a = Seq(3L, 11L, 12L, 99L)
    assert(sparkInterp(a, 0.0) == 3.0)
    assert(sparkInterp(a, 1.0) == 99.0)
  }

  test("interpSql renders the identical value in the Spark engine") {
    // run the SQL mirror through Spark itself (DuckDB parity is the
    // oracle sweep's job): identical formula -> identical doubles
    val ps = Seq(0.25, 0.5, 0.75)
    val a = Seq(10L, 20L, 30L, 50L, 110L, 111L)
    for (p <- ps) {
      // DuckDB's `list[i]` is 1-based; Spark's SQL brackets are 0-based,
      // so translate to element_at (also 1-based) before replaying here
      val sql = ExactQuantile.interpSql("cs", "n", p.toString)
        .replaceAll("""cs\[([^\]]+)\]""", "element_at(cs, CAST($1 AS INT))")
      val df = Seq(Tuple1(a)).toDF("cs")
        .withColumn("n", size(col("cs")))
        .selectExpr(s"$sql AS q")
      val got = df.head().getDouble(0)
      val want = ref(a, p)
      assert(java.lang.Double.doubleToLongBits(got)
        == java.lang.Double.doubleToLongBits(want), s"p=$p: $got != $want")
    }
  }
}
