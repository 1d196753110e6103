package graft.operators

import graft.SparkSpec

class GraphBroadcastSpec extends SparkSpec {

  test("default budget derives exactly the measured-crossover 1M nodes") {
    assert(GraphBroadcast.DefaultBudgetBytes / GraphBroadcast.BytesPerScoreRow
      == 1000000L)
    assert(GraphBroadcast.maxNodes(spark, -1L) == 1000000L ||
      spark.conf.getOption(
        "spark.graft.graph.broadcastBudgetBytes").nonEmpty)
  }

  test("explicit caps pass through; conf override moves the derived cap") {
    assert(GraphBroadcast.maxNodes(spark, 0L) == 0L)
    assert(GraphBroadcast.maxNodes(spark, Long.MaxValue) == Long.MaxValue)
    val key = "spark.graft.graph.broadcastBudgetBytes"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, (48L * 1000 * 1000).toString)
      assert(GraphBroadcast.maxNodes(spark, -1L) == 2000000L)
      spark.conf.set(key, "1") // degenerate budget still yields >= 1
      assert(GraphBroadcast.maxNodes(spark, -1L) == 1L)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
