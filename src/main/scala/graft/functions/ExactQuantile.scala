package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Type-7 interpolated quantile STATED EXPLICITLY over a sorted array,
  * with a SQL mirror the DuckDB oracle renders from the same formula.
  *
  * Why not `percentile`/`quantile_cont`: the engines' built-in
  * continuous-quantile aggregates interpolate with opaque, differing
  * association orders, and the resulting ulp flips fixed-dp rounding on
  * tie-adjacent values (surfaced on `quantiles_exact` at sf0.001 —
  * ARCHITECTURE.md "Correctness strategy"). Stating
  * `h = p·(n−1); v[⌊h⌋] + (h−⌊h⌋)·(v[⌊h⌋+1] − v[⌊h⌋])` identically on
  * both sides makes the interpolated value bit-identical whenever the
  * array elements are exact (integer cents, half-integer deviations).
  *
  * Buffering note: this sorts one in-memory array per group — the same
  * per-group buffering the built-in exact `percentile` does (and
  * ClickHouse's `quantilesExact`). Groups must be bounded; the unbounded
  * path is `approx_percentile`'s map-side-combinable sketch
  * (`quality_deciles_approx` precedent).
  */
object ExactQuantile {

  /** `sorted` is a sorted numeric array column (1-indexed via
    * element_at), `n` its length. Elements are cast to double — exact
    * for integer/half-integer grains below 2^53.
    */
  def interp(sorted: Column, n: Column, p: Double): Column = {
    val h = lit(p) * (n - 1).cast("double")
    val lo = element_at(sorted, (floor(h) + 1).cast("int")).cast("double")
    val hi = element_at(sorted, least(floor(h) + 2, n).cast("int"))
      .cast("double")
    lo + (h - floor(h)) * (hi - lo)
  }

  /** DuckDB rendering of [[interp]] over a sorted LIST column `cs` with
    * length `n`: identical operation order, so bit-identical doubles.
    *
    * `p` is forced to DOUBLE before the multiply: a bare `0.9` literal is
    * DECIMAL in DuckDB, and decimal-exact `h = p·(n−1)` differs from
    * Spark's double `h` by ulps whenever p is not binary-exact (benign
    * for 0.25/0.5/0.75, a latent flip for 0.9 — the cast makes both
    * engines run the SAME IEEE multiply).
    */
  def interpSql(cs: String, n: String, p: String): String = {
    val h = s"(CAST($p AS DOUBLE) * ($n - 1))"
    s"(CAST($cs[CAST(FLOOR($h) AS BIGINT) + 1] AS DOUBLE) + " +
      s"($h - FLOOR($h)) * " +
      s"(CAST($cs[LEAST(CAST(FLOOR($h) AS BIGINT) + 2, $n)] AS DOUBLE) - " +
      s"CAST($cs[CAST(FLOOR($h) AS BIGINT) + 1] AS DOUBLE)))"
  }
}
