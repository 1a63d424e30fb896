package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer kernels (Kudo, "Subword Regularization", ACL
  * 2018 — the SentencePiece unigram model): each word segments into the
  * vocabulary pieces minimizing total piece cost, found by Viterbi
  * dynamic programming. The training face
  * ([[graft.operators.Unigram.learnUnigram]]) iterates Viterbi-EM over
  * the distributed word dictionary; the inference face
  * ([[graft.operators.Unigram.unigramStats]]) applies a FROZEN vocab
  * corpus-wide.
  *
  * Determinism contract (load-bearing for the exact q190 oracle):
  * piece costs are INTEGER micro-nat units, and the DP minimizes the
  * combined value `cost_units * 64 + n_pieces` — cost first, then
  * fewest pieces — so the optimum is a single integer comparison any
  * engine replays exactly. Characters absent from the vocabulary
  * segment as single-character UNK pieces at [[UnigramKernel.UnkCostUnits]].
  * Words longer than [[UnigramKernel.MaxWordLen]] code points split
  * into MaxWordLen-sized chunks segmented independently (bounds the DP
  * and lets the SQL replay unroll to a fixed depth); a chunk never
  * holds more than MaxWordLen < 64 pieces, so the `*64` packing is
  * collision-free per chunk.
  */
private[graft] object UnigramKernel {
  /** Cost of an out-of-vocabulary single character, in micro-nats
    * (-ln p = 20 — rarer than anything a real corpus estimates). */
  val UnkCostUnits = 20000000L

  /** Chunk bound: words longer than this segment per 16-code-point
    * block. Keeps the oracle's DP unroll finite and the piece count
    * per chunk under the 64 packing radix. */
  val MaxWordLen = 16

  /** One word as code-point strings (the BpeKernel symbol convention —
    * DuckDB's substr/length count characters, not UTF-16 units). */
  def codePoints(word: String): Array[String] = {
    val n = word.codePointCount(0, word.length)
    val out = new Array[String](n)
    var i = 0; var off = 0
    while (i < n) {
      val next = word.offsetByCodePoints(off, 1)
      out(i) = word.substring(off, next)
      off = next; i += 1
    }
    out
  }

  /** Viterbi DP over one chunk (≤ MaxWordLen code points), returning
    * the packed pair `(v, t)`:
    *
    *  - `v` = min `cost_units · 64 + n_pieces` over all segmentations
    *    into vocab pieces of ≤ `maxPieceLen` code points (plus
    *    single-char UNK fallbacks) — cost first, fewest pieces on
    *    ties. Every position is reachable (UNK guarantees it).
    *  - `t` = the canonical TIEBREAK among equal-`v` segmentations: a
    *    base-`maxPieceLen` digit string where piece i contributes
    *    digit `maxPieceLen − len_i` at weight `b^(i−1)` — the LAST
    *    piece carries the most significant digit, so minimizing `t`
    *    (unsigned) picks the longest final piece, then the longest
    *    second-to-last, … : the lexicographically-smallest reversed
    *    start vector, the SAME canonical the old backtrack
    *    implemented. Equal `v` implies equal piece count (`v` packs
    *    it), so digit strings compare at equal length and the forward
    *    DP keeps optimal substructure.
    *
    * Because the digits ARE the piece lengths, the minimal `(v, t)`
    * pair determines the segmentation outright — piece identity
    * replays from two integers with NO backtrack, which is exactly
    * what q192's SQL oracle does. `t` can reach 2^64 − 1 at
    * `maxPieceLen = 16` (base 16, 16 digits), so every `t` comparison
    * and decode is UNSIGNED.
    */
  def chunkPacked(cps: Array[String], from: Int, until: Int,
                  vocab: Map[String, Long], maxPieceLen: Int): (Long, Long) = {
    val n = until - from
    val b = math.max(1L, maxPieceLen.toLong)
    // weights b^0..b^(n-1); an extending prefix holds <= n-1 pieces,
    // so index n is never read (it would wrap at base 16)
    val pow = new Array[Long](n + 1)
    pow(0) = 1L
    var i = 1
    while (i <= n) { pow(i) = pow(i - 1) * b; i += 1 }
    val dpV = new Array[Long](n + 1)
    val dpT = new Array[Long](n + 1)
    java.util.Arrays.fill(dpV, Long.MaxValue)
    dpV(0) = 0L
    var k = 1
    while (k <= n) {
      var j = math.max(0, k - maxPieceLen)
      while (j < k) {
        if (dpV(j) != Long.MaxValue) {
          val piece = {
            val sb = new java.lang.StringBuilder
            var i = from + j
            while (i < from + k) { sb.append(cps(i)); i += 1 }
            sb.toString
          }
          val cost = vocab.get(piece) match {
            case Some(c) => c
            case None => if (k - j == 1) UnkCostUnits else -1L
          }
          if (cost >= 0L) {
            val v = dpV(j) + cost * 64L + 1L
            val mj = (dpV(j) % 64L).toInt // pieces in the j-prefix
            val t = dpT(j) + (maxPieceLen - (k - j)).toLong * pow(mj)
            if (v < dpV(k) ||
                (v == dpV(k) && java.lang.Long.compareUnsigned(t, dpT(k)) < 0)) {
              dpV(k) = v; dpT(k) = t
            }
          }
        }
        j += 1
      }
      k += 1
    }
    (dpV(n), dpT(n))
  }

  /** The packed `cost_units · 64 + n_pieces` minimum alone — the stats
    * face. Delegates to [[chunkPacked]] so the value and the pieces
    * can never disagree about the optimum.
    */
  def chunkValue(cps: Array[String], from: Int, until: Int,
                 vocab: Map[String, Long], maxPieceLen: Int): Long =
    chunkPacked(cps, from, until, vocab, maxPieceLen)._1

  /** Packed value of a whole word: sum of per-chunk (cost, pieces)
    * decompositions — returned as `(costUnits, nPieces)`. */
  def segmentWord(word: String, vocab: Map[String, Long],
                  maxPieceLen: Int): (Long, Long) = {
    val cps = codePoints(word)
    var cost = 0L; var pieces = 0L
    var off = 0
    while (off < cps.length) {
      val end = math.min(off + MaxWordLen, cps.length)
      val v = chunkValue(cps, off, end, vocab, maxPieceLen)
      cost += v / 64L; pieces += v % 64L
      off = end
    }
    (cost, pieces)
  }

  /** The optimal piece sequence itself (training's E-step face), with
    * the full canonical tie-break (cost, fewest pieces, longest final
    * piece, longest second-to-last, …). No backtrack: [[chunkPacked]]'s
    * tiebreak digits ARE the piece lengths, so the sequence decodes
    * from `(v, t)` directly — first piece in `t`'s least significant
    * digit. Structurally identical to what the q192 oracle replays in
    * SQL, so engine and oracle cannot disagree about identity.
    */
  def segmentPieces(word: String, vocab: Map[String, Long],
                    maxPieceLen: Int): Array[String] = {
    val cps = codePoints(word)
    val b = math.max(1L, maxPieceLen.toLong)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var off = 0
    while (off < cps.length) {
      val end = math.min(off + MaxWordLen, cps.length)
      val (v, t0) = chunkPacked(cps, off, end, vocab, maxPieceLen)
      val m = (v % 64L).toInt
      var t = t0
      var pos = off
      var i = 0
      while (i < m) {
        val len =
          if (b <= 1L) 1
          else maxPieceLen - java.lang.Long.remainderUnsigned(t, b).toInt
        t = java.lang.Long.divideUnsigned(t, b)
        out += cps.slice(pos, pos + len).mkString
        pos += len
        i += 1
      }
      off = end
    }
    out.toArray
  }

  /** All substrings of 1..maxPieceLen code points, with multiplicity —
    * the seed-vocabulary statistic. */
  def allSubstrings(word: String, maxPieceLen: Int): Array[String] = {
    val cps = codePoints(word)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < cps.length) {
      var len = 1
      while (len <= maxPieceLen && i + len <= cps.length) {
        out += cps.slice(i, i + len).mkString
        len += 1
      }
      i += 1
    }
    out.toArray
  }
}

/** `unigram_stats(text)` — per-document (n_pieces, cost_units) under a
  * FROZEN vocab: every whitespace word Viterbi-segmented, counts and
  * integer costs summed. Row-local; zero exchanges at any corpus size.
  */
case class UnigramStats(child: Expression, vocabBc: Broadcast[Map[String, Long]],
                        maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {
  // the expression tree ships only the broadcast HANDLE in each task
  // binary; the vocab itself travels once per executor via the
  // broadcast machinery (torrent blocks), not once per task
  @transient private lazy val vocab: Map[String, Long] = vocabBc.value
  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("cost_units", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    var pieces = 0L; var cost = 0L
    for (w <- BpeKernel.words(text)) {
      val (c, p) = UnigramKernel.segmentWord(w, vocab, maxPieceLen)
      cost += c; pieces += p
    }
    InternalRow(pieces, cost)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `unigram_pieces(text)` — the optimal piece sequence of every word,
  * flattened: the tokens face, and the E-step counting statistic (one
  * explode + count per EM round). */
case class UnigramPieces(child: Expression, vocabBc: Broadcast[Map[String, Long]],
                         maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val vocab: Map[String, Long] = vocabBc.value
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    for (w <- BpeKernel.words(text);
         p <- UnigramKernel.segmentPieces(w, vocab, maxPieceLen))
      out += UTF8String.fromString(p)
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `unigram_seed_substrings(text)` — all 1..maxPieceLen-code-point
  * substrings of every word, with multiplicity: the seed-vocabulary
  * counting statistic. */
case class UnigramSeedSubstrings(child: Expression, maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    for (w <- BpeKernel.words(text);
         s <- UnigramKernel.allSubstrings(w, maxPieceLen))
      out += UTF8String.fromString(s)
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object UnigramFunctions {
  import ColumnBridge.{column, expression}

  /** One broadcast per COLUMN CONSTRUCTION (one per query / EM round),
    * referenced by handle from every task — never serialized into the
    * expression tree itself. Stale round vocabs are reclaimed by the
    * ContextCleaner once the round's plan is garbage. */
  private def bcast(vocab: Map[String, Long]): Broadcast[Map[String, Long]] =
    SparkSession.active.sparkContext.broadcast(vocab)

  def unigramStats(text: Column, vocab: Map[String, Long], maxPieceLen: Int): Column =
    column(UnigramStats(expression(text), bcast(vocab), maxPieceLen))
  def unigramPieces(text: Column, vocab: Map[String, Long], maxPieceLen: Int): Column =
    column(UnigramPieces(expression(text), bcast(vocab), maxPieceLen))
  def unigramSeedSubstrings(text: Column, maxPieceLen: Int): Column =
    column(UnigramSeedSubstrings(expression(text), maxPieceLen))
}
