package graft.operators

import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

import graft.{SparkEntry, SparkSpec}

/** The shared-session cache contract, enforced for EVERY registered
  * query: after `run → materialize → CacheScope.release(spark)`, no
  * graft-created cache blocks survive. A persist site that bypasses the
  * [[CacheScope]] registry (a bare `.persist` added in a future change)
  * leaks MEMORY_AND_DISK blocks into a long-lived host session — this
  * spec makes that a CI failure instead of a production leak.
  *
  * Locally-checkpointed RDDs are exempt: the graph/recall operators
  * truncate per-round lineage through `localCheckpoint`, whose blocks
  * are GC-scoped (freed by the ContextCleaner when the result frame is
  * dropped), not session-scoped caches.
  */
class CacheHygieneSpec extends SparkSpec {

  private def leakedAfterRelease(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    // the Bench consume: forces every column of every row
    df.select(xxhash64(df.columns.toIndexedSeq.map(c => col(s"`$c`")): _*)
      .as("h")).agg(bit_xor(col("h"))).collect()
    CacheScope.release(spark)
    val leaked = spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.isCheckpointed)
      .map(r => s"RDD ${r.id} [${r.getStorageLevel.description}] $r")
      .toSeq
    // drop any stragglers so one query's leak can't cascade into the next
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.isCheckpointed).foreach(_.unpersist(false))
    leaked
  }

  // every registered query, one test each (so a leak names its query)
  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name releases all cache blocks via CacheScope") {
      val leaked = leakedAfterRelease(name)
      assert(leaked.isEmpty,
        s"$name left ${leaked.size} cache entr(ies) after " +
          s"CacheScope.release:\n${leaked.mkString("\n")}")
    }
  }
}
