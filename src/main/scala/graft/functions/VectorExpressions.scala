package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Shared machinery for pairwise float/double-vector expressions over
  * `ArrayType(FloatType|DoubleType)` columns (the `embeddings.embedding`
  * fixture column is `array<float>`).
  *
  * North-star similarity-search scalar kernel (SURVEY.md §2.2 Q14). All
  * arithmetic is performed in Double after widening, so results are
  * deterministic and match an oracle that casts to DOUBLE[] first.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @inline protected final def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** `dot(a, b)` — inner product in Double; null on length mismatch. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      val lf = leftIsFloat; val rf = rightIsFloat
      var s = 0.0; var i = 0; val n = a.numElements()
      while (i < n) { s += elem(a, i, lf) * elem(b, i, rf); i += 1 }
      s
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val la = if (leftIsFloat) s"(double)$a.getFloat($i)" else s"$a.getDouble($i)"
      val rb = if (rightIsFloat) s"(double)$b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) { $s += $la * $rb; }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `cosine_similarity(a, b)` = dot(a,b) / (||a||·||b||), computed in one
  * pass in Double. Null on length mismatch or a zero-norm input.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      val lf = leftIsFloat; val rf = rightIsFloat
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0; val n = a.numElements()
      while (i < n) {
        val x = elem(a, i, lf); val y = elem(b, i, rf)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) null
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val la = if (leftIsFloat) s"(double)$a.getFloat($i)" else s"$a.getDouble($i)"
      val rb = if (rightIsFloat) s"(double)$b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    double $x = $la; double $y = $rb;
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API surface for the vector kernels. */
object VectorFunctions {
  import ColumnBridge.{column, expression}
  def dot(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))
  def cosineSimilarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
}
