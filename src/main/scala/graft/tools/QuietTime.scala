package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

import graft.SparkEntry

/** Dev tool: the quiet re-measure protocol (ARCHITECTURE.md's
  * `sequence_next_node` precedent) as a harness — time a registered
  * query N times IN ONE JVM with Bench's exact consumption
  * (construction + full-column xxhash64/bit_xor fold inside the timed
  * region — queries like dedup_recall do their work at construction,
  * so PlanAudit's count()-only loop would time nothing) and Bench's
  * hygiene (CacheScope release + clearCache between runs). Run it on an
  * otherwise-idle host; the first run carries codegen/JIT warmup, the
  * later runs are the quiet floor.
  *
  * usage: runMain graft.tools.QuietTime <sfDir> <q1,q2,...> [reps=3]
  */
object QuietTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = graft.Tuning.shufflePartitionsFor(sfDir, cpus.toInt)
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    graft.Tuning.applySessionTuning(spark)
    graft.Tuning.applyScanSpread(spark, sfDir, cpus.toInt)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.select(xxhash64(
            df.columns.toIndexedSeq.map(c => col(s"`$c`")): _*).as("h"))
          .agg(bit_xor(col("h"))).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.operators.CacheScope.release(spark)
        spark.catalog.clearCache()
        println(f"[quiet] $name%-28s run$i $sec%8.2fs")
      }
    }
    spark.stop()
  }
}
