package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{RollingHashExpr, RollingWindowHashExpr, VectorDotExpr}

/** Session extension wiring: makes the engine's custom expressions
  * available to plain SQL users —
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   spark.sql("SELECT rolling_hash(text), vector_dot(a, b) FROM t")
  *
  * No custom Rule/SparkStrategy is injected on purpose: SURVEY.md §4
  * found zero planner work needed for parity, and every graft operator
  * composes built-ins Catalyst already optimizes. The extension surface
  * is exactly the two measured-win expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (FunctionIdentifier("rolling_hash"),
        new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
        (args: Seq[Expression]) => {
          require(args.length == 1,
            s"rolling_hash expects 1 argument, got ${args.length}")
          RollingHashExpr(args.head)
        }))
    e.injectFunction(
      (FunctionIdentifier("rolling_hash_windows"),
        new ExpressionInfo(classOf[RollingWindowHashExpr].getName,
          "rolling_hash_windows"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            s"rolling_hash_windows expects (string, width), got ${args.length} args")
          RollingWindowHashExpr(args.head, GraftExtensions.literalWidth(args(1)))
        }))
    e.injectFunction(
      (FunctionIdentifier("vector_dot"),
        new ExpressionInfo(classOf[VectorDotExpr].getName, "vector_dot"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            s"vector_dot expects 2 arguments, got ${args.length}")
          VectorDotExpr(args(0), args(1))
        }))
  }
}

object GraftExtensions {
  /** The window width must be a foldable int literal — a per-row width
    * would defeat the per-width power precomputation (and makes no sense
    * for fixed-window dedup).
    */
  private[graft] def literalWidth(e: Expression): Int = {
    require(e.foldable, "rolling_hash_windows width must be a literal")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"rolling_hash_windows width must be an int literal, got $other")
    }
  }
}

/** Imperative twin of [[GraftExtensions]] for sessions that already
  * exist (tests, notebooks).
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    RollingHashExpr.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash_windows", exprs => {
        require(exprs.length == 2,
          s"rolling_hash_windows expects (string, width), got ${exprs.length} args")
        RollingWindowHashExpr(exprs.head, GraftExtensions.literalWidth(exprs(1)))
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => {
        require(exprs.length == 2,
          s"vector_dot expects 2 arguments, got ${exprs.length}")
        VectorDotExpr(exprs(0), exprs(1))
      }, "scala_udf")
  }
}
