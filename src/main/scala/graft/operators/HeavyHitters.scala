package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-items ("heavy hitters") in two distributed passes —
  * the Misra-Gries + recount construction [public: Misra & Gries 1982;
  * the parallel-merge form in Agarwal et al. 2013 "Mergeable Summaries"]:
  *
  *   pass 1: each partition keeps a k-counter Misra-Gries summary
  *           (k = ceil(1/minFraction)); an item with global frequency
  *           >= minFraction * n must exceed n/(k+1) in at least one
  *           partition (averaging), so the union of summaries is a
  *           guaranteed SUPERSET of the true heavy hitters;
  *   pass 2: exact recount restricted to those candidates (a broadcast
  *           semi-join — candidates are bounded by partitions x k, never
  *           corpus-sized), then the exact threshold filter.
  *
  * The result is therefore EXACT — identical to a full GROUP BY + HAVING —
  * while the wide shuffle only ever carries candidate items: at 100 TB
  * the full-vocabulary aggregate (hundreds of millions of group keys)
  * never happens; the one full-data pass is map-side only. Output is
  * deterministic regardless of partitioning, which is what makes this
  * sketch operator oracle-checkable at the driver, unlike MinHash/HLL.
  */
object HeavyHitters {

  /** Items of `itemCol` (cast to string) with frequency >=
    * ceil(minFraction * total), with exact counts.
    */
  def frequentItems(
      items: DataFrame,
      itemCol: String,
      minFraction: Double): DataFrame = {
    require(minFraction > 0 && minFraction <= 1,
      "minFraction must be in (0, 1]")
    val k = math.ceil(1.0 / minFraction).toInt
    import items.sparkSession.implicits._
    val it = items.select(col(itemCol).cast("string").as("item"))
    val candidates = it.as[String]
      .mapPartitions { rows =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        rows.foreach { x =>
          counters.get(x) match {
            case Some(c) => counters(x) = c + 1
            case None if counters.size < k => counters(x) = 1L
            case None =>
              // decrement-all; the incoming item is absorbed by the step
              val dead = List.newBuilder[String]
              counters.foreach { case (key, v) =>
                if (v == 1) dead += key else counters(key) = v - 1
              }
              dead.result().foreach(counters.remove)
          }
        }
        counters.keysIterator
      }
      .toDF("item")
      .distinct()
    val total = it.agg(count(lit(1)).as("total"))
    // Threshold in exact decimal arithmetic: a double product can overshoot
    // an exact integer (0.07 * 100 = 7.000000000000001) and ceil() would
    // then silently drop items at exactly minFraction * n — breaking both
    // the GROUP BY + HAVING equivalence and oracle parity (DuckDB computes
    // the same threshold in DECIMAL).
    val minFracDec = new java.math.BigDecimal(minFraction.toString)
    it.join(broadcast(candidates), "item")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") >= ceil(lit(minFracDec) * col("total")))
      .select(col("item"), col("freq"))
  }

  /** Weighted heavy hitters (ClickHouse `topKWeighted`'s exact cousin):
    * items whose WEIGHT SUM reaches `minFraction` of the total weight,
    * with exact sums — same two-pass construction as [[frequentItems]]
    * with the weighted Misra-Gries step [public: Misra & Gries 1982
    * generalizes: on overflow, decrement every counter by
    * d = min(incoming weight, min counter) and credit the incoming item
    * the remainder; an item with global weight > total/(k+1) still
    * survives some partition's summary, so the candidate union stays a
    * guaranteed superset]. Weights must be non-negative integers
    * (callers convert money to cents etc. — integer weights keep the
    * exact-recount threshold in decimal arithmetic, the
    * [[frequentItems]] precedent).
    */
  def frequentItemsWeighted(
      items: DataFrame,
      itemCol: String,
      weightCol: String,
      minFraction: Double): DataFrame = {
    require(minFraction > 0 && minFraction <= 1,
      "minFraction must be in (0, 1]")
    val k = math.ceil(1.0 / minFraction).toInt
    import items.sparkSession.implicits._
    val it = items.select(col(itemCol).cast("string").as("item"),
      col(weightCol).cast("long").as("wt"))
    val candidates = it.as[(String, Long)]
      .mapPartitions { rows =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        rows.foreach { case (x, w) =>
          if (w > 0) counters.get(x) match {
            case Some(c) => counters(x) = c + w
            case None if counters.size < k => counters(x) = w
            case None =>
              val d = math.min(w, counters.values.min)
              val dead = List.newBuilder[String]
              counters.foreach { case (key, v) =>
                if (v == d) dead += key else counters(key) = v - d
              }
              dead.result().foreach(counters.remove)
              if (w > d) counters(x) = w - d
          }
        }
        counters.keysIterator
      }
      .toDF("item")
      .distinct()
    val total = it.agg(sum(col("wt")).as("total"))
    val minFracDec = new java.math.BigDecimal(minFraction.toString)
    it.join(broadcast(candidates), "item")
      .groupBy(col("item"))
      .agg(sum(col("wt")).as("weight"))
      .crossJoin(broadcast(total))
      .filter(col("weight") >= ceil(lit(minFracDec) * col("total")))
      .select(col("item"), col("weight"))
  }
}
