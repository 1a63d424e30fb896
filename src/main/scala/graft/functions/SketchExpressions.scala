package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, MapType}

/** `dd_estimate(buckets, rank)` — the query face of
  * [[graft.operators.Sketches.DdSketchAggregator]]: walk the DDSketch
  * bucket-count map in key order and return the midpoint
  * `2γ^k/(γ+1)` of the bucket containing the `rank`-th smallest
  * value (Masson, Lee, Rim, "DDSketch: a fast and fully-mergeable
  * quantile sketch with relative-error guarantees", VLDB 2019). As an
  * expression it composes with any grouping shape — the group key
  * keeps its NATIVE type through the aggregate instead of being forced
  * to string by a typed flatMap's fixed row encoding. A rank beyond
  * the sketch's total mass returns the top bucket's midpoint; an empty
  * map returns NaN (mirrors [[graft.operators.Sketches.ddEstimate]]).
  */
case class DdEstimate(left: Expression, right: Expression, gamma: Double)
    extends BinaryExpression with CodegenFallback {
  require(gamma > 1.0 && gamma < 2.0, s"need 1 < gamma < 2, got $gamma")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dd_estimate"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (MapType(IntegerType, LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (map<int,bigint>, bigint), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }
  }

  override def nullSafeEval(buckets: Any, rank: Any): Any = {
    val m = buckets.asInstanceOf[MapData]
    val r = rank.asInstanceOf[Long]
    val n = m.numElements()
    if (n == 0) return Double.NaN
    val ks = m.keyArray().toIntArray()
    val vs = m.valueArray().toLongArray()
    val idx = Array.range(0, n)
    // sort indices by bucket key (maps carry no order guarantee)
    val sorted = idx.sortBy(ks(_))
    var cum = 0L
    var i = 0
    while (i < n) {
      cum += vs(sorted(i))
      if (cum >= r)
        return 2.0 * StrictMath.pow(gamma, ks(sorted(i))) / (gamma + 1.0)
      i += 1
    }
    2.0 * StrictMath.pow(gamma, ks(sorted(n - 1))) / (gamma + 1.0)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SketchFunctions {
  import ColumnBridge.{column, expression}

  /** Rank-`rank` DDSketch estimate from a bucket-count map column. */
  def ddEstimate(buckets: Column, rank: Column, gamma: Double): Column =
    column(DdEstimate(expression(buckets), expression(rank), gamma))
}
