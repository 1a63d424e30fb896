package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Document-sketch expressions for the north-star dedup operators
  * (MinHash+LSH, SimHash). Single-pass over the token/shingle array:
  * one xxHash64 per element, then cheap per-function mixing — versus the
  * k-passes-over-the-array plan a `transform(sequence(...))` composition
  * of built-ins would produce.
  *
  * Hash-function family: h_i(x) = base(x) * A(i) + B(i) over Z/2^64 with
  * odd multipliers A(i) (a 2-universal-style affine family; wrapping
  * arithmetic is intentional). Constants derive deterministically from
  * `seed` via java.util.Random (algorithm fixed by the JDK spec, so
  * signatures are stable across JVMs/executors).
  */
object HashFamilies {
  def multipliers(k: Int, seed: Long): Array[Long] = {
    val rnd = new java.util.Random(seed)
    Array.fill(k)(rnd.nextLong() | 1L) // odd => bijective mod 2^64
  }
  def offsets(k: Int, seed: Long): Array[Long] = {
    val rnd = new java.util.Random(seed + 0x9E3779B97F4A7C15L)
    Array.fill(k)(rnd.nextLong())
  }
}

/** `minhash_signature(shingles)` — array<string> → array<long> of k
  * per-hash-function minima. Null input → null; empty array → signature
  * of Long.MaxValue entries (matches "no shingles" semantics).
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val as: Array[Long] = HashFamilies.multipliers(numHashes, seed)
  @transient private lazy val bs: Array[Long] = HashFamilies.offsets(numHashes, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = XxHash64Function.hash(s, StringType, seed)
        var j = 0
        while (j < numHashes) {
          val v = base * as(j) + bs(j)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `simhash64(tokens)` — array<string> → 64-bit SimHash fingerprint.
  * Token multiplicity weights bits naturally (duplicates vote twice).
  */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashFunctions {
  import ColumnBridge.{column, expression}

  /** k-minima MinHash signature of a shingle array. */
  def minhashSignature(shingles: Column, numHashes: Int = 128, seed: Long = 42L): Column =
    column(MinHashSignature(expression(shingles), numHashes, seed))

  /** 64-bit SimHash of a token array. */
  def simhash64(tokens: Column, seed: Long = 42L): Column =
    column(SimHash64(expression(tokens), seed))
}
