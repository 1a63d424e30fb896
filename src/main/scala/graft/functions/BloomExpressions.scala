package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter bit math shared by the build aggregator
  * ([[graft.operators.Sketches.BloomAggregator]]) and the probe
  * expression ([[LongBloomMightContain]]) — ONE definition of the slot
  * function, so a filter built anywhere probes identically everywhere
  * (Bloom, "Space/time trade-offs in hash coding with allowable
  * errors", CACM 1970; double hashing per Kirsch & Mitzenmacher 2006).
  *
  * Positions are `(h1 + i·h2) mod m` with both halves pushed through a
  * 64-bit avalanche finalizer first — `m` is a multiple of 64 here, so
  * raw affine low bits (weak mod powers of two) would alias whole words.
  */
object BloomBits {

  /** MurmurHash3-style 64-bit finalizer (public constants). */
  @inline def fmix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  @inline private def pos(h1: Long, h2: Long, i: Int, mBits: Int): Int =
    java.lang.Math.floorMod(h1 + i.toLong * h2, mBits.toLong).toInt

  def add(bits: Array[Long], numHashes: Int, seed: Long, x: Long): Unit = {
    val mBits = bits.length << 6
    val h1 = fmix(x ^ seed)
    val h2 = fmix(x + 0x9E3779B97F4A7C15L * (seed | 1L)) | 1L
    var i = 0
    while (i < numHashes) {
      val p = pos(h1, h2, i, mBits)
      bits(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  def contains(bits: Array[Long], numHashes: Int, seed: Long, x: Long): Boolean = {
    val mBits = bits.length << 6
    val h1 = fmix(x ^ seed)
    val h2 = fmix(x + 0x9E3779B97F4A7C15L * (seed | 1L)) | 1L
    var i = 0
    while (i < numHashes) {
      val p = pos(h1, h2, i, mBits)
      if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `long_bloom_might_contain(x)` — true iff `x` may be in the set the
  * `bits` were built from; false is definitive. The bit array rides
  * into the task as a codegen reference object (same lifecycle as
  * [[NearestCentroid]]'s centroid table): kilobytes broadcast once per
  * executor, probed at full codegen speed — the map-side prefilter that
  * lets a decontamination pass drop non-matching shingles BEFORE any
  * shuffle when the benchmark side is too big to hash-set broadcast.
  */
case class LongBloomMightContain(child: Expression, bits: Array[Long],
                                 numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(bits.nonEmpty && numHashes >= 1,
    s"need a non-empty bit array and numHashes >= 1, got ${bits.length} longs, $numHashes hashes")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "long_bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a BIGINT child, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    BloomBits.contains(bits, numHashes, seed, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomBits.contains($ref, $numHashes, ${seed}L, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
