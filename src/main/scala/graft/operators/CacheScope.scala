package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of the mid-plan caches graft code creates.
  *
  * Several operators persist an intermediate frame that feeds MULTIPLE
  * consumers inside one returned LAZY plan — minhash signatures, shingle
  * inverted indexes, ER key projections, the packing token projection.
  * The operator cannot unpersist before the caller consumes the plan, so
  * by construction the cache outlives the call. This registry makes the
  * release path PRECISE for shared, long-lived sessions: every
  * graft-created cache is persisted through [[cache]], and [[release]]
  * drops exactly those entries — caches the session's USER created are
  * untouched (the blunt alternative, `spark.catalog.clearCache()`, drops
  * everything, which a library must not do to its host).
  *
  * Contract (the bpeRounds caller-owned-unpersist contract, centralized):
  * run query → materialize → `CacheScope.release(spark)`. Bench and
  * Verify follow it between queries; CacheHygieneSpec runs every
  * registered query and asserts that after release no graft cache entry
  * remains, so a future persist site that bypasses this registry fails
  * CI rather than leaking MEMORY_AND_DISK blocks into a production
  * session. Operators that can scope their cache internally (annRecall,
  * dedupRecall, bpeRounds) still unpersist eagerly — release is then a
  * no-op for them.
  *
  * References are STRONG while a frame stays cached — they must be:
  * `persist` registers the plan in the session's CacheManager, so a
  * weakly-held wrapper could be GC'd mid-query and leave blocks that
  * release() can no longer drop (the CacheManager itself pins the data;
  * the ContextCleaner never reclaims it). Boundedness comes from
  * DEREGISTRATION ON UNPERSIST instead: every [[cache]]/[[release]]/
  * [[trackedCount]] call purges entries whose storage level has gone
  * back to NONE, so frames an operator already unpersisted eagerly
  * (bpeRounds dicts, Dedup.incremental's admitted frame) do not pile up
  * between release() calls in a host session that never calls release —
  * the registry holds logical plans only for data that is actually
  * still cached.
  */
object CacheScope {
  private val tracked = scala.collection.mutable.HashMap
    .empty[SparkSession, scala.collection.mutable.ArrayBuffer[DataFrame]]

  private def purge(buf: scala.collection.mutable.ArrayBuffer[DataFrame]): Unit =
    buf.filterInPlace(_.storageLevel != StorageLevel.NONE)

  /** Persist `df` at MEMORY_AND_DISK and register it for [[release]].
    * Drop-in for the bare `.persist(MEMORY_AND_DISK)` call. */
  def cache(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    val buf = tracked.getOrElseUpdate(
      df.sparkSession, scala.collection.mutable.ArrayBuffer.empty)
    purge(buf)
    buf += p
    p
  }

  /** Unpersist (non-blocking) every frame [[cache]] registered for this
    * session and forget them. Frames an operator already unpersisted
    * were deregistered on the way. Safe to call between any two queries;
    * not transactional against a CONCURRENT query in the same session
    * (same as clearCache).
    */
  def release(spark: SparkSession): Unit = synchronized {
    tracked.remove(spark).foreach(_.foreach(_.unpersist()))
  }

  /** Number of still-CACHED registered frames for a session (spec
    * hook); deregisters already-unpersisted entries as a side effect. */
  def trackedCount(spark: SparkSession): Int = synchronized {
    tracked.get(spark).map { buf => purge(buf); buf.size }.getOrElse(0)
  }

  /** Postfix form: `df.cacheTracked()` ≡ `CacheScope.cache(df)`. */
  implicit class Cacheable(private val df: DataFrame) extends AnyVal {
    def cacheTracked(): DataFrame = CacheScope.cache(df)
  }
}
