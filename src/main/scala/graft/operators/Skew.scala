package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for algebraic aggregations.
  *
  * A single hot key (one event_type, one tenant, one date) turns a
  * one-shuffle groupBy into a straggler task at warehouse scale. Salting
  * splits every group into `salts` sub-groups on a random-but-deterministic
  * shard key, aggregates partials, then combines — two small shuffles
  * instead of one skewed one. Only valid for algebraic aggregates
  * (sum/count/min/max: partials combine losslessly).
  *
  * AQE's skew-join handling covers joins; this is the groupBy-side
  * counterpart Spark does not re-plan automatically.
  */
object Skew {

  /** Two-phase salted sum/count. `aggs` maps output column name ->
    * (source column, "sum" | "count" | "min" | "max").
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      aggs: Map[String, (String, String)],
      salts: Int = 16): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // deterministic shard: hash of the whole row's source columns would
    // recompute; xxhash64 over a monotonically increasing id is enough to
    // spread rows and keeps the result reproducible
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val partialAggs = aggs.toSeq.map { case (out, (src, fn)) =>
      (fn match {
        case "sum" => sum(col(src))
        case "count" => count(col(src))
        case "min" => min(col(src))
        case "max" => max(col(src))
        case other => throw new IllegalArgumentException(
          s"saltedAgg supports algebraic aggregates only, got $other")
      }).as(s"__p_$out")
    }
    val combineAggs = aggs.toSeq.map { case (out, (_, fn)) =>
      (fn match {
        case "sum" | "count" => sum(col(s"__p_$out"))
        case "min" => min(col(s"__p_$out"))
        case "max" => max(col(s"__p_$out"))
      }).as(out)
    }
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combineAggs.head, combineAggs.tail: _*)
  }

  /** Skew-mitigated inner equi-join: the big (skewed) side gets a
    * deterministic per-row salt, the small side is replicated once per
    * salt value, and the join keys become (key, salt) — so a hot join key
    * spreads over `salts` reducer partitions instead of one straggler.
    * Shuffle volume: big side unchanged, small side x salts (use for
    * big-to-modest joins where the small side is too large to broadcast
    * outright but cheap to replicate a few ways). Result is row-identical
    * to the plain inner join — the driver oracle checks exactly that.
    * Prefer AQE's skew-join split when it fires; this is the explicit
    * form for when it can't (e.g. skew inside one bucketed partition or
    * non-shuffle joins AQE won't re-plan).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
