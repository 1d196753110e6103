package graft.queries

import graft.SparkSpec

/** The generated n×n Laplace-expansion SQL ([[CoreQueries.detSql]]) is
  * the load-bearing piece of the p = 5 holidays ridge oracle — this
  * spec evaluates the generated EXPRESSION (numeric literals substituted
  * for the Gram column names, run through Spark SQL so the same
  * expression grammar the oracle relies on is what's parsed) against a
  * direct cofactor computation, on matrices where naive arithmetic
  * slips: asymmetric, with negative and fractional entries.
  */
class DetSqlSpec extends SparkSpec {

  private def detRef(m: Array[Array[Double]]): Double =
    if (m.length == 1) m(0)(0)
    else (0 until m.length).map { j =>
      val minor = m.drop(1).map(r =>
        r.zipWithIndex.collect { case (v, k) if k != j => v })
      val s = if (j % 2 == 0) 1.0 else -1.0
      s * m(0)(j) * detRef(minor)
    }.sum

  private def evalSql(m: Array[Array[Double]]): Double = {
    val names = m.map(_.map(v => s"CAST($v AS DOUBLE)").toIndexedSeq).toIndexedSeq
    val sql = CoreQueries.detSql(names)
    spark.sql(s"SELECT $sql AS d").collect().head.getDouble(0)
  }

  test("generated 5x5 determinant matches the direct cofactor expansion") {
    val m = Array(
      Array(8.000001, 4.0, 1.2857, 0.5714, 2.0),
      Array(4.0, 3.5000001, 1.469, 0.653, 0.857),
      Array(1.2857, 1.469, 2.1306, 0.3265, 0.1428),
      Array(0.5714, 0.653, 0.3265, 1.5306, -0.25),
      Array(2.0, 0.857, 0.1428, -0.25, 2.0))
    val got = evalSql(m)
    val want = detRef(m)
    assert(math.abs(got - want) <= 1e-9 * math.abs(want),
      s"det5: $got vs $want")
  }

  test("generated 3x3 and 4x4 base cases agree with the reference") {
    val m3 = Array(
      Array(2.0, -1.0, 3.0),
      Array(0.5, 4.0, -2.0),
      Array(1.0, 0.0, 1.5))
    assert(math.abs(evalSql(m3) - detRef(m3)) < 1e-12)
    val m4 = Array(
      Array(1.0, 2.0, 3.0, 4.0),
      Array(-1.0, 0.5, 2.0, 1.0),
      Array(0.0, 3.0, -2.0, 2.5),
      Array(4.0, 1.0, 0.0, -1.0))
    assert(math.abs(evalSql(m4) - detRef(m4)) <= 1e-10 * math.abs(detRef(m4)))
  }

  test("a singular matrix determines to ~0 (the ridge diagonal is what " +
    "keeps the oracle's system away from this)") {
    val m = Array(
      Array(1.0, 2.0, 3.0, 4.0, 5.0),
      Array(2.0, 4.0, 6.0, 8.0, 10.0), // 2x row 1
      Array(0.0, 1.0, 0.0, 1.0, 0.0),
      Array(3.0, 0.0, 1.0, 0.0, 2.0),
      Array(1.0, 1.0, 1.0, 1.0, 1.0))
    assert(math.abs(evalSql(m)) < 1e-9)
  }
}
