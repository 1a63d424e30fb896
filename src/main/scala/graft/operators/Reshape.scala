package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long→wide reshaping (pivot) as one conditional aggregation.
  *
  * Spark's own `RelationalGroupedDataset.pivot` plans TWO aggregation
  * phases — a pre-aggregate keyed on (group, pivot) then a `pivotfirst`
  * re-aggregate keyed on (group) — i.e. two Exchanges, and `pivotfirst`
  * is not codegen-friendly. With the pivot values known up front the
  * same result is a single `groupBy(group).agg(f(when(pivot === v, x)))`
  * per value: one shuffle, map-side partial aggregation, whole-stage
  * codegen end to end. At 100 TB that halves the shuffle count; with
  * values NOT given, built-in pivot additionally runs a distinct
  * values-discovery job (a full extra scan), which this API makes
  * impossible to trigger by construction — values are a required
  * argument, as a static output schema should be.
  */
object Reshape {

  /** Pivot `pivotCol` into one column per value in `values`, aggregating
    * `valueCol` with `agg` (a Column → Column aggregate builder, e.g.
    * `sum`). Rows whose pivot value is not listed are dropped, matching
    * built-in pivot semantics. Output columns are named exactly by each
    * value's string form (matching built-in pivot's single-agg naming).
    */
  def pivotWide(df: DataFrame, groupCol: String, pivotCol: String,
                values: Seq[Any], valueCol: Column,
                agg: Column => Column): DataFrame = {
    require(values.nonEmpty, "pivot values must be non-empty")
    val aggs = values.map { v =>
      agg(when(col(pivotCol) === lit(v), valueCol)).as(v.toString)
    }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
