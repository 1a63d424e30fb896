package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `string_array_except_set(tokens)` — drop every element that is in a
  * fixed excluded set, PRESERVING order and duplicates (unlike
  * `array_except`, which dedups the left side). The driver-provided set
  * rides in the expression as a hashed `UTF8String` set, so membership
  * is O(1) per element — the composed alternative (`filter(tokens, t ->
  * !array_contains(lit(stop), t))`) runs the lambda interpreted and
  * scans the literal array linearly per element: O(|tokens|·|stop|)
  * interpreted vs one hashed pass here (BASELINE.md `df_prune`). The
  * apply face of [[graft.operators.Corpus.pruneHighDfTokens]].
  */
case class StringArrayExceptSet(child: Expression, excluded: Array[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "string_array_except_set"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<string>, got ${other.catalogString}")
    }
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(16, excluded.length * 2))
    excluded.foreach(e => s.add(UTF8String.fromString(e)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) out.add(null)
      else {
        val v = arr.getUTF8String(i)
        if (!set.contains(v)) out.add(v)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
