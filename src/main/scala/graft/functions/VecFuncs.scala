package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY §2 D5–D7,
  * D13), built from codegen'd higher-order functions — no UDFs.
  *
  * Everything is a *sequential index-order fold* (`aggregate` over
  * `zip_with`), not a tree reduction: floating-point addition isn't
  * associative, and the fold makes the result bit-identical to the
  * DuckDB oracle's `list_reduce` with the same element order — so
  * cosine scores hash-match exactly with no rounding slop.
  */
object VecFuncs {

  /** Σ aᵢ·bᵢ with float→double widening per element. */
  def vdot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def vnorm(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** cosine(a, b) — same expression shape as the oracle:
    * dot / (sqrt(na) * sqrt(nb)).
    */
  def vcos(a: Column, b: Column): Column = vdot(a, b) / (vnorm(a) * vnorm(b))
}
