package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert (SCD-1 MERGE semantics): apply a batch of updates onto a
  * base table, keeping exactly one row per key.
  *
  * Precedence: an update row always beats a base row for the same key
  * (incoming-batch-wins, the MERGE ... WHEN MATCHED THEN UPDATE contract);
  * within one side, higher `versionCols` (compared in order, descending)
  * win — callers include a unique id as the last version column to make
  * the winner fully deterministic under ties.
  *
  * Scale shape: one hash shuffle on the key columns, a per-key window
  * keeping row 1, no driver state. At 100 TB the window's per-key state
  * is one counter; a pathologically hot key is an input-data bug (keys
  * are meant unique per side), and AQE's skew handling covers the
  * shuffle. Contrast with a join-based MERGE (base LEFT ANTI updates,
  * then union): same shuffle count but two joins; the single-window form
  * also dedups WITHIN each side for free.
  */
object Merge {

  def upsert(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      versionCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs >= 1 key column")
    require(versionCols.nonEmpty,
      "upsert needs >= 1 version column (end with a unique id for determinism)")
    val reserved = Set("__src", "__rn")
    val clashes = (base.columns ++ updates.columns).filter(reserved)
    require(clashes.isEmpty,
      s"reserved internal column name(s) in input: ${clashes.distinct.mkString(", ")}")
    val b = base.withColumn("__src", lit(0))
    val u = updates.withColumn("__src", lit(1))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__src").desc +: versionCols.map(col(_).desc): _*)
    b.unionByName(u)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
  }

  /** CDC MERGE — [[upsert]] plus WHEN MATCHED ... DELETE: `changes` rows
    * carry an `opCol` ('d' = delete the key, anything else = upsert).
    * The LATEST change per key (by `versionCols`, change-batch beating
    * base) decides: if it is a delete the key disappears, else it
    * replaces the base row — i.e. a delete followed by a later re-insert
    * correctly survives. Same single keyed shuffle + one-row window as
    * [[upsert]] (the delete is a post-window filter, not a second join);
    * an out-of-band tombstone join would cost the same exchange and lose
    * the within-batch ordering semantics.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      versionCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "applyChanges needs >= 1 key column")
    require(versionCols.nonEmpty,
      "applyChanges needs >= 1 version column (end with a unique id for determinism)")
    val reserved = Set("__src", "__rn", "__op")
    require(!reserved(opCol), s"opCol must not be a reserved internal name: $opCol")
    val clashes = (base.columns ++ changes.columns.filterNot(_ == opCol)).filter(reserved)
    require(clashes.isEmpty,
      s"reserved internal column name(s) in input: ${clashes.distinct.mkString(", ")}")
    val b = base.withColumn("__src", lit(0)).withColumn("__op", lit("u"))
    // NULL op = upsert, explicitly: a nullable CDC op column must not
    // silently tombstone (col =!= "d" is null-valued for null ops, and a
    // null filter predicate DROPS the row)
    val u = changes.withColumn("__op", coalesce(col(opCol), lit("u"))).drop(opCol)
      .withColumn("__src", lit(1))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__src").desc +: versionCols.map(col(_).desc): _*)
    b.unionByName(u)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") =!= "d")
      .drop("__src", "__rn", "__op")
  }
}
