package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: time any registered query and dump its formatted physical
  * plan — the `.explain("formatted")` audit loop for shuffle/pushdown/
  * codegen review.
  *
  * usage: runMain graft.tools.PlanAudit <sfDir> <queryName> [explain|time]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val mode = if (args.length > 2) args(2) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // mirror Bench's session conf exactly so audited plans are the
    // plans the bench actually runs
    val parts = graft.Tuning.shufflePartitionsFor(sfDir, cpus.toInt)
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    graft.Tuning.applySessionTuning(spark)
    graft.Tuning.applyScanSpread(spark, sfDir, cpus.toInt)
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (mode == "explain" || mode == "both") df.explain("formatted")
    if (mode == "time" || mode == "both") {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[$name run$i] ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      }
    }
    spark.stop()
  }
}
