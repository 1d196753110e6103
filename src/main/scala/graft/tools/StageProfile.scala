package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

import graft.SparkEntry

/** Dev tool: run one registered query with Bench's exact consumption and
  * print a per-job / per-stage wall-clock breakdown — where inside the
  * timed region the seconds actually go (driver planning gaps vs stage
  * compute vs job count). The guide's "empirical first" loop (§1.1)
  * without the UI (disabled in this sandbox).
  *
  * usage: runMain graft.tools.StageProfile <sfDir> <q1,q2,...> [reps=2]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 2
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

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stageAgg = new java.util.concurrent.atomic.AtomicLong(0L)
    val stageCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc) =>
          jobLines.add(
            f"    job ${je.jobId}%3d ${(je.time - t0) / 1000.0}%7.2fs  ${desc.take(80)}")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        for (s <- si.submissionTime; c <- si.completionTime) {
          stageAgg.addAndGet(c - s)
          stageCount.incrementAndGet()
          taskCount.addAndGet(si.numTasks)
          jobLines.add(f"    stage ${si.stageId}%3d ${(c - s) / 1000.0}%7.2fs " +
            f"tasks=${si.numTasks}%3d  ${si.name.take(100)}")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        jobs.clear(); jobLines.clear()
        stageAgg.set(0); stageCount.set(0); taskCount.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tCons = System.nanoTime()
        df.select(xxhash64(
            df.columns.toIndexedSeq.map(c => col(s"`$c`")): _*).as("h"))
          .agg(bit_xor(col("h"))).collect()
        val t1 = System.nanoTime()
        // let listener events drain before reading the queues
        Thread.sleep(300)
        val total = (t1 - t0) / 1e9
        val cons = (tCons - t0) / 1e9
        println(f"[prof] $name run$i total=$total%.2fs construct=$cons%.2fs " +
          f"jobs=${jobs.size()} stages=${stageCount.get} tasks=${taskCount.get} " +
          f"stageWall(sum)=${stageAgg.get / 1000.0}%.2fs")
        jobLines.toArray(Array.empty[String]).sorted.foreach(println)
        graft.operators.CacheScope.release(spark)
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
