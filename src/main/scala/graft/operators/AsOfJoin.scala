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

  /** Match direction, mirroring pandas merge_asof [public API]:
    * Backward = most recent right row at-or-before (the ASOF default),
    * Forward = nearest right row at-or-after.
    */
  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction

  /** Strictly-before backward as-of join — the DuckDB-oracle-checked
    * form; delegates to [[joinAsOf]].
    */
  def joinStrictlyBefore(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      values: Seq[String]): DataFrame =
    joinAsOf(left, right, keys, leftTime, rightTime, values)

  /** General as-of join.
    *
    * @param left      rows to enrich
    * @param right     time-versioned lookup side
    * @param keys      equi-join key columns present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime version-time column on `right`
    * @param values    right-side value columns to carry (must not clash
    *                  with left column names)
    * @param strict    true = the matched right time must differ from the
    *                  left time (strictly before/after); false = a
    *                  same-instant right row matches (ASOF >= semantics)
    * @param direction backward (default) or forward match
    * @param toleranceSeconds max |leftTime - matched rightTime| in
    *                  seconds; matches farther away yield NULLs (pandas
    *                  merge_asof tolerance). Times are compared on the
    *                  second grid via a timestamp cast.
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      values: Seq[String],
      strict: Boolean = true,
      direction: Direction = Backward,
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs >= 1 key column (see scaladoc)")
    // the implementation introduces these working columns via withColumn,
    // which silently OVERWRITES an existing column of the same name and
    // corrupts the join — reject them on both input schemas up front
    locally {
      val reserved = Set("__t", "__tag", "__isleft", "__vals", "__rt", "__carried")
      val clashes = (left.columns ++ right.columns ++ values).filter(reserved)
      require(clashes.isEmpty,
        s"reserved internal column name(s) in input: ${clashes.distinct.mkString(", ")}")
    }
    val leftCols = left.columns.toSeq
    // All right-side values travel inside ONE struct: last(ignoreNulls)
    // then skips only the placeholder-null left rows, never a genuine
    // NULL inside a right row's value column (a bare last(v, ignoreNulls)
    // would carry a stale older value past a legitimately-null newer row,
    // diverging from ASOF JOIN semantics). The struct also carries the
    // matched right TIME so the tolerance gate can measure the gap.
    val valueStruct = struct(values.map(col) :+
      col(rightTime).cast("timestamp").as("__rt"): _*)
    val structType = org.apache.spark.sql.types.StructType(
      values.map(v => right.schema(v)) :+
        org.apache.spark.sql.types.StructField("__rt",
          org.apache.spark.sql.types.TimestampType))
    // scan-order tag: with strict semantics the left row must sort before
    // a same-instant right row (so it can't see it); inclusive flips that
    val (leftTag, rightTag) = if (strict) (0, 1) else (1, 0)
    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(leftTag))
      .withColumn("__isleft", lit(true))
      .select((keys.map(col) :+ col("__t") :+ col("__tag") :+ col("__isleft")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(structType).as("__vals"): _*)
    val taggedRight = right
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(rightTag))
      .withColumn("__isleft", lit(false))
      .select((keys.map(col) :+ col("__t") :+ col("__tag") :+ col("__isleft")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        valueStruct.as("__vals"): _*)
    val timeOrder = direction match {
      case Backward => col("__t").asc
      case Forward  => col("__t").desc
    }
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("__carried", last(col("__vals"), ignoreNulls = true).over(w))
      .filter(col("__isleft"))
    val gap = direction match {
      case Backward =>
        unix_timestamp(col("__t").cast("timestamp")) -
          unix_timestamp(col("__carried").getField("__rt"))
      case Forward =>
        unix_timestamp(col("__carried").getField("__rt")) -
          unix_timestamp(col("__t").cast("timestamp"))
    }
    val withinTol = toleranceSeconds.map(s => gap <= lit(s)).getOrElse(lit(true))
    carried.select((keys ++ leftCols.filterNot(keys.contains)).map(col) ++
      values.map(v =>
        when(withinTol, col("__carried").getField(v)).as(v)): _*)
  }
}
