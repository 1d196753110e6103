package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming front end for the reference's input contract
  * (SURVEY.md §2.7, §7.5a): the reference assumes pre-bucketed daily
  * `bucket_*` tables already exist in the warehouse; this produces them
  * continuously from an events stream.
  *
  * Works identically on a batch DataFrame (unit tests / backfill) and a
  * readStream source: the plan is the same tumbling-window aggregation;
  * only the sink mode differs.
  */
object EventBucketizer {

  /** Daily tumbling-window buckets with late-data handling.
    *
    * `approx_count_distinct` stands in for the batch path's exact
    * countDistinct: exact distinct aggregation is not incrementally
    * computable under append-mode watermarking, and at 100 TB a sketch is
    * the right answer on the batch side too (documented divergence from
    * Bucketize.events).
    */
  def dailyBuckets(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(
        count(lit(1)).as("event_count"),
        round(sum(col("value")), 2).as("value_sum"),
        approx_count_distinct(col("user_id")).as("active_users"))
      .select(to_date(col("w.start")).as("date"), col("event_count"),
        col("value_sum"), col("active_users"))

  /** Per-(user, event_type) running counters via explicit state — the
    * `mapGroupsWithState` pattern for aggregations that aren't
    * window-expressible (cumulative per-key state across triggers).
    */
  final case class UserTypeCount(user_id: Long, event_type: String, n: Long)

  def runningUserTypeCounts(
      events: Dataset[(Long, String)]): Dataset[UserTypeCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey { case (uid, et) => (uid, et) }
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + rows.size
          state.update(next)
          UserTypeCount(key._1, key._2, next)
      }
  }

  /** Gap-based sessions as a streaming aggregation: `session_window`
    * merges events within `gap` of each other per user — the streaming
    * twin of the batch lag-window sessionize query (RelationalQueries).
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("value_sum"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("value_sum"))

  /** Trailing 7-day reach, streaming: SLIDING event-time windows (7-day
    * width, 1-day slide — each event lands in its 7 trailing windows,
    * the same 7x fan-out the batch `sliding_reach` query materializes
    * with an explode) + `approx_count_distinct`, because exact sliding
    * distinct would need per-window user sets in state; the batch twin
    * stays exact and `hll_reach` pins the sketch's accuracy against it.
    */
  def slidingReach(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "7 days", "1 day").as("w"))
      .agg(approx_count_distinct(col("user_id")).as("reach_7d"))
      .select(to_date(col("w.end")).as("window_end"), col("reach_7d"))

  /** Exact trailing-7-day event counts/sums: the deterministic sibling of
    * [[slidingReach]] for the oracle gate — `count`/`sum` ARE exactly
    * incrementally computable under sliding windows (unlike distinct), so
    * this one needs no sketch. Label = last day the window covers
    * (`w.end - 1 day`), matching the batch `sliding_reach` day convention.
    */
  def slidingCounts(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "7 days", "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("value_sum"))
      .select(date_sub(to_date(col("w.end")), 1).as("day"),
        col("n_events"), col("value_sum"))

  /** Stream-static enrichment: per-micro-batch broadcast hash join of a
    * streaming frame against a static dimension — the standard pattern
    * for attaching slowly-changing metadata (user tier, source catalog)
    * without a stateful stream-stream join. The static side re-resolves
    * each micro-batch, so a reloaded dimension table is picked up on the
    * next trigger; no watermark or state store involved.
    */
  def enriched(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Streaming near-exact dedup — the streaming counterpart of
    * [[graft.operators.Dedup.exact]]: emits only the FIRST arrival of each
    * distinct text. Keyed on (xxhash64(text), length(text)) so the dedup
    * state store holds ~12 bytes per distinct doc instead of the full text
    * (the same shrink-the-shuffle-key trick the batch operator documents
    * for 100 TB); the length component shrinks the collision surface to
    * same-length hash collisions. Unlike the batch `exactHashKeyed`, which
    * re-verifies collided groups on the full text, this path cannot —
    * state must stay bounded — so two distinct same-length texts colliding
    * on xxhash64 (~n^2/2^65 over a watermark window of n docs) silently
    * drop one row. That residual risk is the price of bounded state.
    * `dropDuplicatesWithinWatermark` bounds state: a key is evicted once
    * the watermark passes its event time, so state scales with the
    * duplicate-arrival horizon (how late a dup can trail its original),
    * not with corpus size — the property that makes streaming dedup
    * feasible on an unbounded corpus.
    */
  def streamingDedup(docs: DataFrame, watermark: String = "1 day"): DataFrame =
    docs
      .withColumn("text_hash", xxhash64(col("text")))
      .withColumn("text_len", length(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash", "text_len")
      .drop("text_hash", "text_len")

  /** Stream-stream interval join — the funnel edge as a JOIN rather than
    * a state machine: each view pairs with the same user's clicks in
    * (view_ts, view_ts + maxGap]. Both sides are watermarked and the
    * join condition bounds click_ts relative to view_ts from BOTH sides,
    * which is what lets Structured Streaming evict buffered rows: a view
    * older than watermark - maxGap can never match a future click, so
    * state scales with (event rate x maxGap + lateness horizon), not
    * stream length. Equi-key on user_id keeps the state store hash-
    * partitioned; inner join so no null-side buffering. The batch twin
    * is the identical expression on static frames (stream ≡ batch
    * tested) — the plan differs only in state management.
    */
  def viewClickPairs(views: DataFrame, clicks: DataFrame,
      maxGap: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    intervalJoin(views, clicks, maxGap, watermark, "inner")

  /** Shared body of the inner/outer interval joins — one place for the
    * join condition and watermarks, so the two variants cannot drift.
    */
  private def intervalJoin(views: DataFrame, clicks: DataFrame,
      maxGap: String, watermark: String, joinType: String): DataFrame = {
    val v = views
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", watermark)
    val c = clicks
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    v.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") > col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $maxGap"),
      joinType)
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** LEFT OUTER variant of [[viewClickPairs]]: views that never click
    * within `maxGap` emit with a NULL click side — but only once the
    * watermark passes `view_ts + maxGap`, because until then a matching
    * click could still arrive. That deferred-emission semantic is the
    * streaming-correct version of "conversion failed", and it's why the
    * outer side needs BOTH the watermark and the two-sided time bound:
    * without the bound the engine could never prove a view unmatched
    * and would buffer it forever. With a finite test input the tail of
    * unmatched views (watermark never advances past the last event)
    * legitimately stays open — the spec asserts exactly that subset
    * relationship against the batch truth.
    */
  def viewClickPairsOuter(views: DataFrame, clicks: DataFrame,
      maxGap: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    intervalJoin(views, clicks, maxGap, watermark, "left_outer")

  /** Continuous writer: append daily buckets as date-partitioned parquet —
    * the streaming twin of ParquetCatalog.writeTable. Returns the started
    * query; caller owns lifecycle.
    */
  def writeDaily(events: DataFrame, outPath: String, checkpoint: String) =
    dailyBuckets(events).writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("date")
      .start()

  /** Continuous keyed upsert into a catalog table: each micro-batch is
    * applied onto the current table state with [[graft.operators.Merge
    * .upsert]] semantics (incoming batch wins per key) via `foreachBatch` —
    * the plain-parquet stand-in for `MERGE INTO` on a transactional table
    * format. The merge is one keyed window over base ∪ batch (dedups the
    * batch against itself AND the table), written through the catalog's
    * staging-swap (`replaceTable`) so the plan can read the table it
    * replaces — fully distributed, nothing funnels through the driver.
    * Table size grows with distinct keys, not stream length.
    */
  def upsertInto(
      updates: DataFrame,
      catalog: graft.catalog.ParquetCatalog,
      tableName: String,
      keys: Seq[String],
      versionCols: Seq[String],
      checkpoint: String) =
    updates.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val base =
          if (catalog.tableExists(tableName)) catalog.load(tableName)
          else batch.limit(0)
        val merged = graft.operators.Merge.upsert(base, batch, keys, versionCols)
        catalog.replaceTable(tableName, merged, sortCol = keys.head)
      }
      .start()

  /** Continuous incremental-rollup maintenance: each micro-batch of raw
    * events folds into the persisted daily rollup through
    * [[graft.operators.Rollup.merge]] — the streaming materialized-view
    * loop. Every rollup column is a monoid (counts, exact cent sums,
    * min/max, HLL sketch states), so per trigger the work is
    * Rollup.daily(batch) over the BATCH only plus a merge shuffled on
    * (day, type) — one row per touched key — never a rescan of history;
    * the result lands through the catalog's crash-safe staging swap.
    * RollupSpec pins the fold algebra; StreamingSpec pins stream ≡ batch
    * on the final table.
    */
  def rollupInto(
      events: DataFrame,
      catalog: graft.catalog.ParquetCatalog,
      tableName: String,
      checkpoint: String) =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = graft.operators.Rollup.daily(batch)
        val merged =
          if (catalog.tableExists(tableName))
            graft.operators.Rollup.merge(catalog.load(tableName), delta)
          else delta
        catalog.replaceTable(tableName, merged, sortCol = "d")
      }
      .start()
}
