package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right-side value
  * whose time key is strictly before the left row's time.
  *
  * Spark has no native ASOF JOIN (DuckDB does — the oracle uses it);
  * preference order from the build guide says compose built-ins before
  * reaching for a custom SparkPlan, and the classic composition is:
  * union both sides tagged, one window sorted by (time, tag) per join
  * key, `last_value(..., ignoreNulls)` to carry the right value forward,
  * then keep only left rows.
  *
  * Scale: one shuffle+sort keyed by `keys` — same cost shape as a
  * sort-merge join. The window needs `keys` to parallelize; a keyless
  * as-of degenerates to a single-partition sort (as any global-order
  * operator does), so high-cardinality callers should pass their natural
  * entity key or a salted derivative.
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     time-versioned lookup side
    * @param keys      equi-join key columns present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime version-time column on `right`
    * @param values    right-side value columns to carry (must not clash
    *                  with left column names)
    */
  def joinStrictlyBefore(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      values: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs >= 1 key column (see scaladoc)")
    val leftCols = left.columns.toSeq
    // All right-side values travel inside ONE struct: last(ignoreNulls)
    // then skips only the placeholder-null left rows, never a genuine
    // NULL inside a right row's value column (a bare last(v, ignoreNulls)
    // would carry a stale older value past a legitimately-null newer row,
    // diverging from ASOF JOIN semantics).
    val valueStruct = struct(values.map(col): _*)
    val structType = {
      val fields = values.map(v => right.schema(v))
      org.apache.spark.sql.types.StructType(fields)
    }
    // tag 0 = left, 1 = right; at equal times left sorts first, so a left
    // row never sees a same-instant right value => strictly-before
    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(0))
      .select((keys.map(col) :+ col("__t") :+ col("__tag")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(structType).as("__vals"): _*)
    val taggedRight = right
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(1))
      .select((keys.map(col) :+ col("__t") :+ col("__tag")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        valueStruct.as("__vals"): _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .withColumn("__carried", last(col("__vals"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
      .select((keys ++ leftCols.filterNot(keys.contains)).map(col) ++
        values.map(v => col("__carried").getField(v).as(v)): _*)
  }
}
