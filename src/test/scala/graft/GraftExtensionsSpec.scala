package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions=graft.GraftExtensions exposes SQL functions") {
    // force a genuinely new session: getOrCreate() would silently hand
    // back another suite's extension-less default session
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      def direct(s: String): Long = {
        var h = 0L
        s.getBytes("UTF-8").foreach(b =>
          h = h * graft.functions.RollingHashExpr.Base + (b & 0xff))
        h
      }
      val r = s2.sql(
        "SELECT rolling_hash('abc') AS h, vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
          "rolling_hash_windows('abcd', 4) AS ws")
        .head()
      assert(r.getLong(0) == direct("abc"))
      assert(r.getDouble(1) == 11.0)
      // a full-width window's single hash equals the whole-string hash
      assert(r.getSeq[Long](2) == Seq(direct("abcd")))
      // a per-row (non-foldable) width is rejected at analysis time
      intercept[Exception](
        s2.sql("SELECT rolling_hash_windows('abc', c) FROM (VALUES (2)) t(c)").collect())
    } finally {
      prior match {
        case Some(p) =>
          // don't stop s2: it shares the JVM-wide SparkContext with the
          // other suites' session; just restore the default
          SparkSession.setDefaultSession(p)
          SparkSession.setActiveSession(p)
        case None => s2.stop()
      }
    }
  }

  test("GraftFunctions.registerAll works on an existing session") {
    GraftFunctions.registerAll(spark)
    val d = spark.sql("SELECT vector_dot(array(1.0D, 1.0D), array(2.0D, 5.0D)) AS d")
      .head().getDouble(0)
    assert(d == 7.0)
  }
}
