package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string — the document-fingerprint
  * primitive (content hash that can be windowed/extended incrementally).
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` rather
  * than a Scala UDF: the generated code is a single static call on the
  * already-materialized UTF8String, so it stays inside whole-stage codegen
  * with no boxing/serialization penalty on the hot path.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RollingHashExpr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashExpr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

/** All fixed-width window hashes of a string in ONE pass — the
  * substring-dedup primitive at scale: instead of exploding w-char
  * substrings (w bytes of shuffle per window position), explode these
  * 8-byte hashes and group on them. True rolling computation: after the
  * first window, each successive hash is O(1) (subtract the outgoing
  * byte's contribution, multiply by Base, add the incoming byte), so a
  * document of n bytes costs O(n), not O(n*w).
  *
  * Windows are over UTF-8 BYTES (same convention as xxhash64); for the
  * ASCII fixtures bytes == characters. Returns an empty array when the
  * string is shorter than the window.
  */
case class RollingWindowHashExpr(child: Expression, width: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash_windows needs a string argument, got ${child.dataType}")
    else if (width < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash_windows needs width >= 1, got $width")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    RollingWindowHashExpr.hashes(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingWindowHashExpr.hashes($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): RollingWindowHashExpr =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash_windows"
}

object RollingWindowHashExpr {

  /** Static entry point shared by interpreted eval and generated code. */
  def hashes(s: UTF8String, width: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length - width + 1
    if (n <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    // Base^(width-1): the outgoing byte's positional weight
    var pow = 1L
    var j = 1
    while (j < width) { pow *= RollingHashExpr.Base; j += 1 }
    val out = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < width) { h = h * RollingHashExpr.Base + (bytes(i) & 0xff); i += 1 }
    out(0) = h
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * RollingHashExpr.Base +
        (bytes(i + width - 1) & 0xff)
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  import org.apache.spark.sql.graft.ColumnBridge

  def rolling_hash_windows(c: Column, width: Int): Column =
    ColumnBridge.column(RollingWindowHashExpr(ColumnBridge.expression(c), width))
}

/** `a * h + b` over LongType with Java wrap semantics (mod 2^64). Spark 4's
  * default ANSI mode makes the equivalent Column arithmetic THROW on
  * overflow, but the multiply-shift MinHash perm family needs the wrap —
  * so the two constants are baked into a codegen'd expression (one fused
  * multiply-add per row, no boxing, stays in whole-stage codegen).
  */
case class MulAddWrapExpr(child: Expression, a: Long, b: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes() =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mul_add_wrap needs a bigint argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    a * input.asInstanceOf[Long] + b

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(${a}L * $c + ${b}L)")

  override protected def withNewChildInternal(newChild: Expression): MulAddWrapExpr =
    copy(child = newChild)

  override def prettyName: String = "mul_add_wrap"
}

object MulAddWrapExpr {
  import org.apache.spark.sql.graft.ColumnBridge

  def mul_add_wrap(c: Column, a: Long, b: Long): Column =
    ColumnBridge.column(MulAddWrapExpr(ColumnBridge.expression(c), a, b))
}

object RollingHashExpr {

  /** JOAAT-style multiplier; Long arithmetic wraps (mod 2^64) by design. */
  final val Base = 1315423911L

  /** Static entry point shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * Base + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  import org.apache.spark.sql.graft.ColumnBridge

  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(c)))

  /** Register as a SQL function: SELECT rolling_hash(text) FROM ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHashExpr(exprs.head), "scala_udf")
}
