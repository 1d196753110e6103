package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over `array<float|double>` columns.
  *
  * The `zip_with`+`aggregate` formulation allocates a lambda-evaluated
  * intermediate array per row pair — measured 40s for a 2M-pair cosine scan
  * at sf0.1. This expression is a tight primitive loop over the unsafe
  * ArrayData (no intermediate array, no boxing) that whole-stage codegen
  * inlines as one static call.
  *
  * Every element is widened to DOUBLE before multiplying and the sum is
  * sequential, so results are bit-identical to the previous formulation
  * and to the DuckDB oracle's CAST(... AS DOUBLE[]) math.
  *
  * Null elements inside the arrays are not expected (embedding columns);
  * a null array yields null via the standard null-intolerant contract.
  */
case class VectorDotExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vector_dot needs array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  private lazy val leftIsFloat = elemType(left).contains(FloatType)
  private lazy val rightIsFloat = elemType(right).contains(FloatType)

  override def nullSafeEval(l: Any, r: Any): Any =
    VectorDotExpr.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.VectorDotExpr.dot($l, $r, $leftIsFloat, $rightIsFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

object VectorDotExpr {

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vector_dot: dimension mismatch ($n vs ${b.numElements()})" +
          " — truncating silently would return plausible-but-wrong similarities")
    var s = 0.0
    var i = 0
    if (aFloat && bFloat) {
      while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    } else if (aFloat && !bFloat) {
      while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    } else if (!aFloat && bFloat) {
      while (i < n) { s += a.getDouble(i) * b.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    s
  }
}
