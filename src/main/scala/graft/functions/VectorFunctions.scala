package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.ColumnBridge

/** Vector math over `array<float|double>` embedding columns, backed by the
  * native codegen'd [[VectorDotExpr]] kernel (a zip_with/aggregate
  * formulation was ~20x slower on pairwise scans — see VectorDot.scala).
  *
  * All math is done in DOUBLE regardless of storage type: both engines
  * (and the DuckDB oracle) then produce bit-identical sequential sums,
  * which keeps rounded cosine values hash-comparable.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VectorDotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms — avoids re-reducing the arrays when
    * norms are materialized once per side before a pairwise join.
    */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Symmetric int8 quantization: per-vector scale = max|x| / 127,
    * codes = round(x / scale) as tinyint. Returns struct(scale float,
    * codes array<tinyint>) — 4x smaller at rest than float32, the
    * standard storage trade for 100 TB embedding columns (per-element
    * error <= scale/2; angular error is what the recall test bounds).
    * All built-ins, so it stays inside whole-stage codegen.
    */
  def quantizeInt8(v: Column): Column = {
    val scale = greatest(
      array_max(transform(v, x => abs(x.cast("double")))), lit(1e-30)) / 127.0
    struct(
      scale.cast("float").as("scale"),
      transform(v, x => round(x.cast("double") / scale).cast("byte")).as("codes"))
  }

  /** Inverse of [[quantizeInt8]]: array<float> reconstruction. */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"),
      c => (c.cast("double") * q.getField("scale")).cast("float"))
}
