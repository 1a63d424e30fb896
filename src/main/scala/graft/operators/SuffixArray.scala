package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Order-`H` suffix ranking and the per-document repeated-span profile
  * it enables — the exact-substring duplication signal of Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better" (ACL
  * 2022), computed WITHOUT hashing: two positions repeat iff their
  * suffixes literally agree, so unlike the
  * [[Dedup.repeatedWindows]] window-hash tier there are no collisions
  * to argue away, and the span length is measured (up to `H`), not
  * fixed in advance.
  *
  * Design note — direct sort, not prefix doubling. A full suffix array
  * wants Manber–Myers prefix doubling (log n rounds of pair-rank
  * sorts); for the bounded-order profile the right plan is to sort the
  * n order-`H` prefix keys DIRECTLY: one range exchange shipping ≤ `H`
  * extra bytes per position, versus `log2(H)` doubling rounds of ~3
  * exchanges each. At `H = 32` the direct sort moves ~32 bytes × n
  * once; doubling moves ~24 bytes × n some fifteen times — the direct
  * plan wins at any corpus size, and only cedes ground when `H` grows
  * past a few hundred. Row-local LCP then needs NO join ladder at all:
  * rank-adjacent suffixes sit side by side with their prefix strings,
  * and [[graft.functions.CommonPrefixLen]] measures the span in place.
  *
  * Scale shape: one projection (`substr`), one
  * [[Ranks.globalRank]] total-order rank (two-level — no global
  * window), one self-join on `ord ± 1`, one map-side LCP, two
  * partial-aggregating collapses. Nothing is serial in a document's
  * length or the corpus size.
  */
object SuffixArray {

  /** Per-document repeated-span profile over the corpus suffix
    * ranking: for every character position, the longest prefix of its
    * suffix (capped at `maxOrder`) that also occurs at ANY other
    * position in the corpus — the maximum is attained at a
    * rank-adjacent suffix, so only the two suffix-order neighbors are
    * inspected. Returns one row per document:
    * `(doc_id, n_pos, max_rep, n_rep)` — position count, the longest
    * repeated span seen, and how many positions start a repeated span
    * of at least `minLen` characters. All-integer output: the q194
    * oracle replays it bit for bit from the same prefix sort.
    *
    * Truncation doubles as the cap: each prefix string ends at
    * `maxOrder` characters AND at its document's end, so the row-local
    * common-prefix length is automatically `min(true LCP, maxOrder,
    * remaining)` — no separate bounds arithmetic.
    */
  def repeatProfile(docs: DataFrame, idCol: String, textCol: String,
                    maxOrder: Int = 32, minLen: Int = 20): DataFrame = {
    require(maxOrder >= 2, s"maxOrder must be >= 2, got $maxOrder")
    require(minLen >= 1 && minLen <= maxOrder,
      s"minLen must be in [1, maxOrder], got $minLen")

    // (doc_id, pos 1-based, order-H prefix) — the suffix universe;
    // empty/null texts contribute nothing
    val sfx = docs.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).as("doc_id"),
        explode(sequence(lit(1), length(col(textCol)))).as("pos"),
        col(textCol).as("__txt"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        substring(col("__txt"), col("pos"), lit(maxOrder)).as("pfx"))

    // suffix order = total order (prefix, doc, pos): the two-level
    // exact rank — neighbors in this order attain every suffix's
    // maximal LCP, so the profile never compares non-adjacent pairs.
    // Persisted: both sides of the ord±1 self-join read it. The OWNED
    // rank variant hands back the inner ranged frame's release, so the
    // position-scale cache inside globalRank drains too.
    val (ranked, releaseRank) = Ranks.globalRankOwned(sfx,
        Seq(col("pfx"), col("doc_id"), col("pos")), outCol = "__ord")
    val ord = ranked
      .select(col("doc_id"), col("pos"), col("pfx"), col("__ord"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val pairs = ord.select(col("doc_id").as("a_doc"), col("pos").as("a_pos"),
        col("pfx").as("__pa"), col("__ord"))
      .join(ord.select(col("doc_id").as("b_doc"), col("pos").as("b_pos"),
        col("pfx").as("__pb"), (col("__ord") - 1).as("__ord")), "__ord")
      .select(col("a_doc"), col("a_pos"), col("b_doc"), col("b_pos"),
        graft.functions.ArrayFunctions
          .commonPrefixLen(col("__pa"), col("__pb")).as("__lcp"))

    val perPos = pairs.select(col("a_doc").as("doc_id"),
        col("a_pos").as("pos"), col("__lcp"))
      .unionByName(pairs.select(col("b_doc").as("doc_id"),
        col("b_pos").as("pos"), col("__lcp")))
      .groupBy(col("doc_id"), col("pos"))
      .agg(max(col("__lcp")).as("__m"))
    val out = perPos.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_pos"),
        max(col("__m")).as("max_rep"),
        sum(when(col("__m") >= minLen, 1L).otherwise(0L)).as("n_rep"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the doc-count-scale result, then release BOTH
    // position-scale caches (the ord frame here and the ranged frame
    // inside globalRank) — a finished call must not leave corpus-scale
    // blocks in the cache manager
    out.count()
    ord.unpersist(blocking = false)
    releaseRank()
    out
  }
}
