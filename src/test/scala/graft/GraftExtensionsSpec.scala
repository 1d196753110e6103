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
      val r = s2.sql(
        "SELECT rolling_hash('abc') AS h, vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head()
      var expect = 0L
      "abc".getBytes("UTF-8").foreach(b =>
        expect = expect * graft.functions.RollingHashExpr.Base + (b & 0xff))
      assert(r.getLong(0) == expect)
      assert(r.getDouble(1) == 11.0)
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
