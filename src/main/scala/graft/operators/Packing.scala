package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-example assembly: turn a curated document corpus into the
  * batches and fixed-length sequences an LLM trainer actually consumes.
  *
  * Two packing disciplines plus a deterministic training-order shuffle:
  *
  *  - [[packGreedy]] — token-BUDGET batch packing: group documents into
  *    batches whose total weight stays under a budget (variable-length
  *    batching, one doc never split).
  *  - [[packConcat]] — GPT-style concat-and-chunk packing [public:
  *    Radford et al. 2019; T5's pack_dataset]: documents laid end-to-end
  *    in a deterministic order, the token stream cut into exact
  *    context-length windows; a document may straddle a boundary. Output
  *    is the (sequence, document-span) assignment map — all a tokenizing
  *    writer needs to emit the actual arrays, with zero padding waste by
  *    construction.
  *  - [[shuffleOrder]] — dense training-order position 0..N-1 by
  *    (xxhash64(id), id), with the rank computed bucket-locally so no
  *    single reducer ever sees the corpus.
  *
  * The concat/shuffle pair shares one scale idea, the two-level
  * distributed prefix sum ([[withOffsets]]): a global running total is
  * the textbook case where the naive plan — an un-partitioned window —
  * serializes the whole corpus through one task. The two-level form
  * computes per-bucket subtotals (a map-side-combinable hash aggregate),
  * runs the only global window over the <= nBuckets subtotal rows
  * (driver-scale, broadcast back), and finishes with a partition-local
  * window keyed by bucket. Every stage is linear and fully parallel, and
  * the output is bucket-count-independent — the same query hashes
  * identically at any cluster width.
  */
object Packing {

  // ------------------------------------------------------------------
  // Token-budget batch packing (greedy next-fit per group).
  //
  // Optimal bin packing is NP-hard and inherently serial; the scalable
  // compromise is greedy next-fit WITHIN each pack group: documents are
  // grouped by `id mod numPartitions` (an ENGINE-INDEPENDENT assignment —
  // batch composition depends only on (ids, weights, budget, count), not
  // on Spark's hash function, input order, or cluster layout, so an
  // external SQL engine can replay the exact packing), sorted by id
  // within the group, and packed by a single linear scan. One shuffle
  // keyed on the group label; a task may receive several groups
  // (label-hash collisions) — the scan resets its two-integer state at
  // each group boundary. Next-fit wastes at most one under-filled batch
  // per group versus first-fit-decreasing, which is noise once groups
  // hold thousands of documents.
  //
  // A single document heavier than the budget gets a batch of its own
  // (callers chunk oversized docs upstream; silently dropping them would
  // bias the corpus).
  // ------------------------------------------------------------------

  final case class PackedDoc(id: Long, weight: Long, part_id: Int, batch_idx: Int)

  def packGreedy(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      budget: Long,
      numPartitions: Int): Dataset[PackedDoc] = {
    require(budget > 0, "budget must be positive")
    require(numPartitions > 0, "numPartitions must be positive")
    import docs.sparkSession.implicits._
    docs
      .select(col(idCol).cast("long").as("id"),
        col(weightCol).cast("long").as("weight"),
        pmod(col(idCol).cast("long"), lit(numPartitions.toLong)).cast("int").as("part_id"))
      .repartition(numPartitions, col("part_id"))
      .sortWithinPartitions("part_id", "id")
      .as[(Long, Long, Int)]
      .mapPartitions { rows =>
        var cur = Int.MinValue
        var batch = 0
        var acc = 0L
        rows.map { case (id, w, p) =>
          if (p != cur) { cur = p; batch = 0; acc = 0L }
          else if (acc > 0 && acc + w > budget) { batch += 1; acc = 0L }
          acc += w
          PackedDoc(id, w, p, batch)
        }
      }
  }

  // ------------------------------------------------------------------
  // Concat-and-chunk packing + the shared two-level prefix sum.
  // ------------------------------------------------------------------

  /** Exclusive prefix sum of `valueCol` in ascending `orderCols` order.
    *
    * `bucketCol` must be a coarse, CONTIGUOUS-RANGE function of the
    * ordering (same bucket ordering as row ordering); rows are
    * prefix-summed within buckets and offset by the exclusive sum of
    * whole-bucket totals. Adds `offCol` (long); row set and other
    * columns pass through unchanged. The result does not depend on the
    * bucket granularity — only the parallelism does. A dense 0-based
    * rank is the `valueCol = 1` special case ([[shuffleOrder]]).
    */
  def withOffsets(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      bucketCol: org.apache.spark.sql.Column,
      offCol: String = "off"): DataFrame = {
    val bucketed = df.withColumn("_pk_bucket", bucketCol)
    val totals = bucketed.groupBy(col("_pk_bucket"))
      .agg(sum(col(valueCol)).as("_pk_bn"))
    // the ONLY un-partitioned window — over <= nBuckets subtotal rows
    val bucketOff = totals.withColumn(
      "_pk_boff",
      coalesce(
        sum(col("_pk_bn")).over(
          Window.orderBy("_pk_bucket")
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val within = Window.partitionBy("_pk_bucket")
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(bucketOff.select("_pk_bucket", "_pk_boff")), "_pk_bucket")
      .withColumn(offCol,
        col("_pk_boff") + coalesce(sum(col(valueCol)).over(within), lit(0L)))
      .drop("_pk_bucket", "_pk_boff")
  }

  /** [[withOffsets]] generalized to independent prefix sums per key
    * group (one running total per language/domain/shard rather than one
    * global): per-(key, bucket) subtotals via one map-side-combinable
    * aggregate, a PER-KEY window over the <= nBuckets subtotal rows (so
    * even a key owning the whole corpus serializes only its subtotal
    * rows, never its data), and a partition-local window keyed by
    * (key, bucket). This is the scale-safe form of "cumulative sum per
    * group in a fixed order" — the naive per-key window is exactly the
    * skew that made the single-pass sorted-neighborhood ER superlinear
    * (one hot key = one serial task).
    */
  def withKeyedOffsets(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      bucketCol: org.apache.spark.sql.Column,
      offCol: String = "off"): DataFrame = {
    val bucketed = df.withColumn("_pk_bucket", bucketCol)
    val totals = bucketed
      .groupBy((keyCols :+ "_pk_bucket").map(col): _*)
      .agg(sum(col(valueCol)).as("_pk_bn"))
    val bucketOff = totals.withColumn(
      "_pk_boff",
      coalesce(
        sum(col("_pk_bn")).over(
          Window.partitionBy(keyCols.map(col): _*)
            .orderBy("_pk_bucket")
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val within = Window.partitionBy((keyCols :+ "_pk_bucket").map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(
        broadcast(bucketOff.select(
          (keyCols :+ "_pk_bucket" :+ "_pk_boff").map(col): _*)),
        keyCols :+ "_pk_bucket")
      .withColumn(offCol,
        col("_pk_boff") + coalesce(sum(col(valueCol)).over(within), lit(0L)))
      .drop("_pk_bucket", "_pk_boff")
  }

  /** Contiguous-range bucket over a non-negative long id: floor(id / w)
    * with w sized so ~nBuckets buckets cover [0, maxId]. One scalar job
    * to find maxId (an O(1)-to-driver agg, same class as the catalog's
    * count probes).
    */
  def idRangeBucket(df: DataFrame, idCol: String, nBuckets: Int)
      : org.apache.spark.sql.Column = {
    // getAs[Number], not asInstanceOf[Long]: an int/short-typed id column
    // would otherwise die in an opaque ClassCastException deep inside the
    // bucket probe
    val maxId = Option(df.agg(max(col(idCol))).head.getAs[Number](0))
      .map(_.longValue()).getOrElse(0L)
    val w = math.max(1L, maxId / math.max(1, nBuckets) + 1)
    expr(s"$idCol DIV $w")
  }

  /** Concat-and-chunk packing of `docs(doc_id, n)` — n = token count,
    * zero-token docs must be pre-filtered — into windows of `ctxLen`
    * tokens in ascending `orderCol` order (doc_id by default; pass a
    * dense [[shuffleOrder]] position to pack in training order — the
    * production composition). Emits one row per (sequence, document)
    * overlap:
    *
    *  - `seq_id`   — 0-based training-sequence index,
    *  - `doc_id`,
    *  - `tok_from`/`tok_to` — the [from, to) token span of the document
    *    that lands in this sequence (document-local, 0-based),
    *  - `seq_off`  — where in the sequence that span starts,
    *  - `seg_tokens` — span length.
    *
    * Segment explosion is `sequence()` over the first..last window index
    * — linear in ceil(docTokens / ctxLen), never materializing token
    * arrays. Every sequence except possibly the final one is exactly
    * full: concat packing's defining property.
    *
    * The plan consumes `docs` THREE times (the bucket-bounds probe, the
    * subtotal aggregate, the main pass) — pass a CACHED frame, or each
    * consumer re-runs the upstream plan. That's the right trade at any
    * scale: the (id, n) projection is ~16 bytes/doc (a few GB per
    * billion docs), vs re-reading corpus text or re-ranking a shuffle
    * three times.
    *
    * `orderCol` must be a NON-NEGATIVE integral id (any numeric width —
    * it is read as a Number; negatives would break [[idRangeBucket]]'s
    * contiguous-range arithmetic).
    */
  def packConcat(
      docs: DataFrame,
      ctxLen: Int,
      nBuckets: Int = 256,
      orderCol: String = "doc_id"): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    // self-enforcing contract: a zero-token (or NULL-count) doc has no
    // place in a token stream, and its degenerate window range would
    // otherwise emit corrupt segment rows (sequence(a, a-1) DESCENDS in
    // Spark rather than returning empty)
    val nonEmpty = docs.filter(col("n") > 0)
    val withOff = withOffsets(nonEmpty, Seq(orderCol), "n",
      idRangeBucket(nonEmpty, orderCol, nBuckets))
    withOff
      .withColumn("seq_id",
        explode(sequence(
          expr(s"off DIV $ctxLen"),
          expr(s"(off + n - 1) DIV $ctxLen"))))
      .withColumn("_seg_begin", greatest(col("off"), col("seq_id") * ctxLen))
      .withColumn("_seg_end",
        least(col("off") + col("n"), (col("seq_id") + 1) * ctxLen))
      .select(
        col("seq_id"),
        col("doc_id"),
        (col("_seg_begin") - col("off")).as("tok_from"),
        (col("_seg_end") - col("off")).as("tok_to"),
        (col("_seg_begin") - col("seq_id") * ctxLen).as("seq_off"),
        (col("_seg_end") - col("_seg_begin")).as("seg_tokens"))
  }

  /** Per-key EXACT interpolated quantiles WITHOUT a per-key value
    * array — the no-buffer alternative to `collect_list` + sorted-array
    * indexing for order statistics (round 12): `byV` holds one row per
    * DISTINCT (key, value) with its count (`cnt`); the per-key
    * cumulative rank is [[withKeyedOffsets]] over contiguous
    * value-range buckets, and each requested quantile reads its two
    * order statistics (1-based positions floor(h)+1 and
    * min(floor(h)+2, n), h = p·(n−1)) with a conditional max. The
    * interpolation mirrors `graft.functions.ExactQuantile.interp`
    * token for token (double-cast order statistics, h − floor(h)
    * fraction), so results are bit-identical to the buffered form on
    * values below 2^53. Exact-vs-offsets selection guidance lives in
    * QUERIES.md "Choosing exact vs _offsets forms" (the buffered form
    * is cheaper while a group's values fit one task; this one survives
    * any cardinality). Returns (`keyCol`, n, <alias per p>). Widest
    * state anywhere: one count per distinct value per bucket. `byV`
    * feeds FOUR consumers (range probe, subtotal aggregate, main pass,
    * per-key total) — an uncached input is defensively cache-tracked
    * here rather than silently recomputed four times.
    *
    * CACHE-RELEASE OBLIGATION (round-13 ADVICE): the defensive persist
    * is registered with [[CacheScope]], and because the returned frame
    * is lazy this method cannot unpersist it before the caller
    * consumes the result — the cache OUTLIVES the call by design. The
    * Bench/Verify/Scaling drivers release it between queries; a
    * library caller outside those drivers must either call
    * `CacheScope.release(spark)` after consuming the result, or pass
    * an already-cached frame (then no defensive persist happens and
    * the caller owns the lifetime). Skipping both leaks one
    * MEMORY_AND_DISK persist for the session lifetime.
    */
  def keyedQuantiles(byV0: DataFrame, keyCol: String,
      ps: Seq[(Double, String)], nBuckets: Int = 64): DataFrame = {
    require(ps.nonEmpty, "keyedQuantiles: ps must list at least one (p, alias)")
    val byV =
      if (byV0.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        CacheScope.cache(byV0)
      else byV0
    val mm = byV.agg(min(col("v")).as("_qo_mn"), max(col("v")).as("_qo_mx"))
    val b = byV.crossJoin(broadcast(mm))
    val bucket = least(lit((nBuckets - 1).toLong),
      floor((col("v") - col("_qo_mn")).cast("double") * nBuckets /
        ((col("_qo_mx") - col("_qo_mn")).cast("double") + 1.0)).cast("long"))
    val ranked = withKeyedOffsets(b, Seq(keyCol), Seq("v"), "cnt", bucket, "off")
      .drop("_qo_mn", "_qo_mx")
    val nf = byV.groupBy(col(keyCol)).agg(sum(col("cnt")).as("n"))
    val aggs = ps.zipWithIndex.flatMap { case ((p, _), i) =>
      val h = lit(p) * (col("n") - 1).cast("double")
      val loIdx = floor(h).cast("long") + 1
      val hiIdx = least(floor(h).cast("long") + 2, col("n"))
      Seq(
        max(when(col("off") < loIdx && loIdx <= col("off") + col("cnt"),
          col("v"))).as(s"_lo$i"),
        max(when(col("off") < hiIdx && hiIdx <= col("off") + col("cnt"),
          col("v"))).as(s"_hi$i"))
    }
    val picked = ranked.join(broadcast(nf), keyCol)
      .groupBy(col(keyCol), col("n"))
      .agg(aggs.head, aggs.tail: _*)
    val outs = ps.zipWithIndex.map { case ((p, a), i) =>
      val h = lit(p) * (col("n") - 1).cast("double")
      val lo = col(s"_lo$i").cast("double")
      val hi = col(s"_hi$i").cast("double")
      (lo + (h - floor(h)) * (hi - lo)).as(a)
    }
    picked.select(col(keyCol) +: col("n") +: outs: _*)
  }

  /** Deterministic global training-order shuffle of `ids(idCol)`: dense
    * 0-based `position` by ascending (xxhash64(id), id). The bucket is
    * the top byte of the hash — `shiftright` is an ARITHMETIC shift, so
    * it floors toward -infinity and is monotone over the full signed
    * range, making the 256 buckets contiguous hash ranges; xxhash64's
    * uniformity keeps them balanced (no skew salt needed). Rank IS the
    * [[withOffsets]] prefix sum with a unit weight — one machinery, two
    * ops, so the PlanSpec-pinned scale shape can't drift between them.
    * Net: one hash aggregate + one bucket-keyed sort — the same cost as
    * any total-order sort, but with the rank arithmetic exact and
    * single-reducer-free.
    */
  def shuffleOrder(ids: DataFrame, idCol: String = "doc_id"): DataFrame =
    withOffsets(
      ids.select(col(idCol), xxhash64(col(idCol)).as("_sh_h"))
        .withColumn("_sh_one", lit(1L)),
      Seq("_sh_h", idCol), "_sh_one",
      shiftright(col("_sh_h"), 56), "position")
      .select(col("position"), col(idCol))
}
