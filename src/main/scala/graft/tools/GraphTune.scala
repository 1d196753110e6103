package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B harness for the iterative graph operators' physical
  * levers (broadcast vs shuffle join, round-1 fold) — dev evidence only,
  * not part of the library surface.
  */
object GraphTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_x30")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        graft.Tuning.shufflePartitionsFor(dir, 32).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges(): DataFrame = {
      val t = (n: String) => graft.sources.Fixtures.table(spark, dir, n)
      val e0 = t("lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(t("orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .agg(count(lit(1)).as("w"))
      e0
    }

    def time(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = f
      df.select(xxhash64(df.columns.toIndexedSeq.map(c => col(s"`$c`")): _*).as("h"))
        .agg(bit_xor(col("h"))).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.operators.CacheScope.release(spark)
      spark.catalog.clearCache()
      println(f"[graphtune] $label%-28s $sec%8.2fs")
    }

    def prEdges() = {
      val e0 = edges()
      e0.select((col("c") * 2).as("src"), (col("s") * 2 + 1).as("dst"),
          col("w").cast("double").as("w"))
        .union(e0.select(col("s") * 2 + 1, col("c") * 2, col("w").cast("double")))
    }
    def hitsEdges() = edges().select(col("c"), col("s"), col("w").cast("double").as("w"))

    // second CLI arg selects the case family (ADVICE r15: the previous
    // catch-all match silently ran everything)
    val mode = args.drop(1).headOption.getOrElse("all")
    if (mode == "pagerank" || mode == "all") {
      time("warmup pagerank")(graft.operators.PageRank.run(prEdges(), 5))
      time("pagerank bcast")(graft.operators.PageRank.run(prEdges(), 5))
      time("pagerank dangling")(graft.operators.PageRank.run(prEdges(), 5,
        redistributeDangling = true))
      time("pagerank bcast 2")(graft.operators.PageRank.run(prEdges(), 5))
      time("pagerank shuffle")(graft.operators.PageRank.run(prEdges(), 5,
        broadcastMaxNodes = 0L))
    }
    if (mode == "hits" || mode == "all") {
      time("warmup hits")(graft.operators.Hits.run(hitsEdges(), 3))
      time("hits bcast")(graft.operators.Hits.run(hitsEdges(), 3))
      time("hits bcast 2")(graft.operators.Hits.run(hitsEdges(), 3))
    }
    // the node-cap boundary probe (round-16 verdict ask #6): force each
    // physical mode regardless of |V| so the crossover is measurable on
    // replicas that straddle the default cap
    if (mode == "capprobe") {
      time("warmup pagerank")(graft.operators.PageRank.run(prEdges(), 5))
      time("pagerank bcast forced")(graft.operators.PageRank.run(prEdges(), 5,
        broadcastMaxNodes = Long.MaxValue))
      time("pagerank shuffle forced")(graft.operators.PageRank.run(prEdges(), 5,
        broadcastMaxNodes = 0L))
      time("pagerank bcast forced 2")(graft.operators.PageRank.run(prEdges(), 5,
        broadcastMaxNodes = Long.MaxValue))
      time("pagerank shuffle forced 2")(graft.operators.PageRank.run(prEdges(), 5,
        broadcastMaxNodes = 0L))
    }
    spark.stop()
  }
}
