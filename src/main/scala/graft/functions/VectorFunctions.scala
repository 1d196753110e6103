package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns, built from
  * codegen-friendly higher-order functions (`zip_with`/`aggregate`) —
  * no UDFs, so Catalyst can see and optimize the whole expression tree.
  *
  * All math is done in DOUBLE regardless of storage type: both engines
  * (and the DuckDB oracle) then produce bit-identical sequential sums,
  * which keeps rounded cosine values hash-comparable.
  */
object VectorFunctions {

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(v: Column): Column =
    sqrt(aggregate(transform(toDouble(v), x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms — avoids re-reducing the arrays when
    * norms are materialized once per side before a pairwise join.
    */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
