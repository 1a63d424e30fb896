package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric canonicalization helpers shared by every oracle-compared
  * query.
  *
  * The one that matters: IEEE 754 has a signed zero, and engines
  * disagree about which one `round()` emits for a negative value whose
  * rounded magnitude is zero — DuckDB's `round(covar_pop(...), 6)`
  * produced `-0.0` where Spark produced `+0.0` (value-equal, but the
  * driver's hash serializes the sign bit). Every rounded double that a
  * query surfaces goes through [[roundNz]] so the engine side always
  * emits `+0.0`; the matching oracle SQL adds `+ 0` after its `round`
  * (IEEE addition: `-0.0 + 0.0 == +0.0`) so both engines agree bit-wise.
  */
object NumFunctions {

  /** `+0.0` for either signed zero, the input otherwise (null-safe:
    * null stays null, NaN stays NaN). `when` rather than `+ 0.0` so no
    * optimizer rule can ever fold the normalization away.
    */
  def normNegZero(c: Column): Column =
    when(c === 0.0, lit(0.0)).otherwise(c)

  /** `round(c, scale)` with negative zero normalized to `+0.0`. Use for
    * every rounded DOUBLE an oracle-compared query surfaces.
    */
  def roundNz(c: Column, scale: Int): Column =
    normNegZero(round(c, scale))

  /** Driver-side twin of [[normNegZero]] for values rounded in Scala
    * (e.g. BigDecimal.setScale paths that build metadata rows).
    */
  def normNegZero(v: Double): Double = if (v == 0.0) 0.0 else v
}
