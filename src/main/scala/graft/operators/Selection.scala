package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

import graft.functions.{NumFunctions, VectorFunctions}

/** Greedy submodular data selection — facility location (Lin & Bilmes,
  * "A Class of Submodular Functions for Document Summarization", ACL
  * 2011; the standard target-matched subset selector in training-data
  * curation): pick `k` candidates maximizing
  * `F(S) = Σ_t max(0, max_{c ∈ S} sim(c, t))` over a TARGET set — each
  * greedy round adds the candidate with the largest marginal coverage
  * gain, so the selection is target-RELEVANT (high sims) and DIVERSE
  * (a near-duplicate of an already-selected candidate gains ~nothing —
  * exactly what similarity-top-k selection lacks). Greedy is within
  * (1 − 1/e) of optimal for monotone submodular F.
  *
  * Scale shape: target sets are metadata by contract (an eval/probe
  * suite, bounded by `maxTargets`); candidate×target sims build ONCE
  * via a broadcast cross join into per-candidate tid-ordered DECIMAL
  * arrays (one candidate-keyed exchange, persisted). Each of the `k`
  * rounds is then a zero-exchange row-local fold of the sim array
  * against the current cover vector plus ONE TakeOrdered(1) — no
  * per-round shuffle of anything candidate-scale, and the driver
  * state is one decimal per target. The cover vector rides as a
  * SINGLE literal array value (one `Literal` node, not nT scalar
  * literals) while `nT <= coverLiteralMax`; beyond that it routes
  * through a broadcast one-row cover frame joined to the candidates,
  * so plan size and per-round analysis cost stay O(1) in nT either
  * way. The two paths are bit-identical by construction (a
  * SelectionSpec pin re-runs the same input down both).
  *
  * Determinism (the oracle replays all `k` rounds): per-pair cosines
  * round to 6 dp and route through DECIMAL(18,6), so gains are EXACT
  * integer-scaled sums in any partitioning, and the argmax tie-breaks
  * on the candidate id.
  *
  * Returns `k` rows `(sel_rank, vec_id, gain_micros)` in selection
  * order — the marginal gain in exact 1e-6 units (an integer, so the
  * oracle compares without a decimal→double conversion ulp).
  */
object Selection {

  /** Exclude already-picked candidate ids from a round's frame. The
    * greedy loops run up to `maxK` rounds: a growing `isin` literal
    * puts O(r) nodes into round r's plan (re-analyzed every round),
    * while a broadcast left-anti join keeps every round's plan O(1) in
    * the selection size — but builds a broadcast relation per round
    * (~50 ms), which dominates at toy k. Adaptive cut: `isin` while
    * the picked set is small (codegen'd, zero extra jobs, plan growth
    * bounded by the threshold), the anti-join beyond it. The two paths
    * are value-identical (SelectionSpec pins them against each other).
    */
  private[graft] val isinMax = 32

  private[graft] def excludePicked(df: DataFrame, ids: Seq[Long],
                                   antiJoin: Option[Boolean] = None): DataFrame =
    if (ids.isEmpty) df
    else if (!antiJoin.getOrElse(ids.length > isinMax))
      df.filter(!col("cid").isin(ids: _*))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      df.join(broadcast(ids.toDF("cid")), Seq("cid"), "left_anti")
    }

  /** Greedy-round ceiling shared by the selectors: each round is one
    * TakeOrdered(1) job plus O(picked) driver state (ids, and for
    * kcenter/mmr the selected vectors in the round literal), so k is
    * METADATA-bounded by contract — selecting corpus-scale subsets
    * belongs to the threshold/sample operators, not a greedy loop.
    */
  private val maxK = 4096

  private def requireK(k: Int): Unit =
    require(k >= 1 && k <= maxK,
      s"selection size must be in [1, $maxK] (greedy rounds are " +
        s"metadata-bounded: one driver-visible pick per round), got $k")

  def facilityLocation(candidates: DataFrame, targets: DataFrame,
                       idCol: String, vecCol: String, k: Int,
                       maxTargets: Int = 10000,
                       coverLiteralMax: Int = 1024): DataFrame = {
    requireK(k)
    val spark = candidates.sparkSession
    import spark.implicits._
    val dec = DecimalType(18, 6)
    val wide = DecimalType(38, 6)
    val decArr = org.apache.spark.sql.types.ArrayType(dec)

    val t = targets.select(col(idCol).cast("long").as("tid"),
      col(vecCol).as("tvec"))
    val nT = t.count()
    require(nT > 0 && nT <= maxTargets,
      s"target set must be metadata-scale (1..$maxTargets rows), got $nT")

    // candidate × target sims, built once: broadcast targets, row-local
    // cosine, 6-dp decimal routing, then ONE candidate-keyed collapse
    // into tid-ordered arrays. Zero-norm vectors score 0 by convention.
    val scored = candidates
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec"))
      .crossJoin(broadcast(t))
      .select(col("cid"), col("tid"),
        coalesce(NumFunctions.roundNz(VectorFunctions
          .cosineSimilarity(col("cvec"), col("tvec")), 6), lit(0.0))
          .cast(dec).as("s"))
    val arr = scored.groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("tid"), col("s")))),
        e => e.getField("s")).as("ss"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    arr.count()

    val zero = new java.math.BigDecimal("0.000000")
    var cover = Array.fill(nT.toInt)(zero)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    try {
      var r = 1
      var exhausted = false
      while (r <= k && !exhausted) {
        val covSeq = cover.map(scala.math.BigDecimal(_)).toSeq
        val rest = excludePicked(arr, picked.map(_._2).toSeq)
        // the cover vector enters the round's plan either as ONE
        // literal array value (small nT) or via a broadcast one-row
        // frame (large nT) — identical values, O(1) plan nodes both ways
        val (frame, covCol) =
          if (nT <= coverLiteralMax)
            (rest, typedLit(covSeq).cast(decArr))
          else
            (rest.crossJoin(broadcast(Seq(Tuple1(covSeq)).toDF("cov")
              .select(col("cov").cast(decArr).as("cov")))), col("cov"))
        val gain = aggregate(
          zip_with(col("ss"), covCol,
            (s, c) => (greatest(s, c) - c).cast(wide)),
          lit(zero).cast(wide), (acc, x) => acc + x)
        val best = frame.select(col("cid"), gain.as("g"), col("ss"))
          .orderBy(col("g").desc, col("cid").asc).limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val row = best(0)
          val cid = row.getLong(0)
          val g = row.getDecimal(1)
          val ss = row.getAs[scala.collection.Seq[java.math.BigDecimal]](2)
          cover = cover.zip(ss).map { case (c, s) => c.max(s) }
          picked += ((r.toLong, cid, g.movePointRight(6).longValueExact))
          r += 1
        }
      }
    } finally arr.unpersist(blocking = false)

    picked.toSeq.toDF("sel_rank", "vec_id", "gain_micros")
  }

  /** k-center greedy coreset — farthest-point traversal (Gonzalez,
    * "Clustering to minimize the maximum intercluster distance", TCS
    * 1985; the standard diverse-coreset selector, e.g. active-learning
    * core-set selection, Sener & Savarese ICLR 2018): seed with the
    * smallest-id candidate, then each round add the candidate FARTHEST
    * from the selected set (max over remaining of min cosine distance
    * to any selected vector). Greedy is a 2-approximation of the
    * optimal k-center radius; the selection is maximally SPREAD — the
    * diversity complement of [[facilityLocation]] (which maximizes
    * target coverage) and [[mmr]] (which trades relevance against
    * redundancy).
    *
    * Scale shape: the [[mmr]] round discipline — candidates persist
    * once; each round folds the ≤ r − 1 selected vectors from ONE
    * nested-array literal (`transform` + `array_min`) against the
    * candidate vector row-locally, then ONE TakeOrdered(1). No round
    * shuffles anything candidate-scale; plan size is O(1) in k.
    *
    * Determinism: distance = 1 − cosine rounded to 6 dp through
    * DECIMAL(18,6) — exact in any partitioning; argmax ties break on
    * the smallest candidate id. Returns `(sel_rank, vec_id,
    * radius_micros)` in pick order; `radius_micros` is the pick's
    * min-distance-to-selected in exact 1e-6 units, with the seed row
    * reporting 2 000 000 (the cosine-distance ceiling — no selected
    * set exists yet).
    */
  def kcenter(candidates: DataFrame, idCol: String, vecCol: String,
              k: Int): DataFrame = {
    requireK(k)
    val spark = candidates.sparkSession
    import spark.implicits._
    val dec = DecimalType(18, 6)
    val one = new java.math.BigDecimal("1.000000")

    val base = candidates
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    base.count()

    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val selVecs = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    try {
      val seed = base.select(col("cid"), col("cvec"))
        .orderBy(col("cid").asc).limit(1).collect()
      if (seed.nonEmpty) {
        picked += ((1L, seed(0).getLong(0), 2000000L))
        selVecs += seed(0).getAs[scala.collection.Seq[Any]](1)
          .map { case f: Float => f.toDouble; case d: Double => d }.toSeq
      }
      var r = 2
      var exhausted = seed.isEmpty
      while (r <= k && !exhausted) {
        // min cosine distance to the selected set, from one nested-array
        // literal — 1 − cos6 stays exact decimal
        val minSel = array_min(transform(typedLit(selVecs.toSeq),
          v => (lit(one).cast(dec) - coalesce(NumFunctions.roundNz(
            VectorFunctions.cosineSimilarity(col("cvec"), v), 6), lit(0.0))
            .cast(dec)).cast(dec)))
        val rest = excludePicked(base, picked.map(_._2).toSeq)
        val best = rest.select(col("cid"), minSel.as("d"), col("cvec"))
          .orderBy(col("d").desc, col("cid").asc).limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val row = best(0)
          picked += ((r.toLong, row.getLong(0),
            row.getDecimal(1).movePointRight(6).longValueExact))
          selVecs += row.getAs[scala.collection.Seq[Any]](2)
            .map { case f: Float => f.toDouble; case d: Double => d }.toSeq
          r += 1
        }
      }
    } finally base.unpersist(blocking = false)

    picked.toSeq.toDF("sel_rank", "vec_id", "radius_micros")
  }

  /** MMR — maximal marginal relevance re-ranking (Carbonell &
    * Goldstein, SIGIR 1998), the query-time sibling of
    * [[facilityLocation]]: greedily pick `k` candidates maximizing
    * `λ·sim(query, c) − (1−λ)·max_{s ∈ S} sim(c, s)` — relevance traded
    * against redundancy with what's already selected, THE standard
    * diversified re-ranker for retrieval/RAG contexts. Round 1 has no
    * selected set, so it is the pure relevance argmax.
    *
    * Scale shape: the query sim computes once into a persisted
    * `(cid, cvec, sq)` frame (broadcast-free — the query vector is a
    * plan literal); each round's redundancy term folds the ≤ k − 1
    * SELECTED vectors against the candidate vector row-locally, so no
    * round shuffles anything candidate-scale — one TakeOrdered(1)
    * each. The selected vectors enter the round's plan as ONE nested
    * array literal value (a single `Literal` node folded with
    * `transform` + `array_max`), not k − 1 scalar-literal vectors, so
    * plan size stays O(1) in the selection size.
    *
    * Determinism: every cosine rounds to 6 dp through DECIMAL(18,6)
    * and λ enters as the rational `lamNum/lamDen`, so the score
    * `lamNum·sq − (lamDen − lamNum)·maxSel` is EXACT decimal
    * arithmetic (never divided); ties break on the candidate id.
    * Returns `(sel_rank, vec_id, score_micros)` with the λ-SCALED
    * score in 1e-6 units (×`lamDen` relative to the textbook form —
    * rank-equivalent, integer-exact).
    */
  def mmr(candidates: DataFrame, query: DataFrame, idCol: String,
          vecCol: String, k: Int, lamNum: Int = 7,
          lamDen: Int = 10): DataFrame = {
    requireK(k)
    require(lamDen >= 1 && lamNum >= 0 && lamNum <= lamDen,
      s"lambda must be a rational in [0, 1], got $lamNum/$lamDen")
    val spark = candidates.sparkSession
    val dec = DecimalType(18, 6)

    val qRows = query.select(col(vecCol)).collect()
    require(qRows.length == 1, s"query must be ONE row, got ${qRows.length}")
    val qVec = qRows(0).getAs[scala.collection.Seq[Any]](0)
      .map { case f: Float => f.toDouble; case d: Double => d }.toSeq
    def simTo(vec: Seq[Double]): org.apache.spark.sql.Column =
      coalesce(NumFunctions.roundNz(VectorFunctions
        .cosineSimilarity(col("cvec"), typedLit(vec)), 6), lit(0.0)).cast(dec)

    val base = candidates
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec"))
      .withColumn("sq", simTo(qVec))
      .persist(StorageLevel.MEMORY_AND_DISK)
    base.count()

    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val selVecs = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    try {
      var r = 1
      var exhausted = false
      while (r <= k && !exhausted) {
        val score =
          if (selVecs.isEmpty) lit(lamNum) * col("sq")
          else {
            // one nested-array literal holding ALL selected vectors;
            // per-row: cosine against each, max — same 6-dp decimal
            // routing as the per-vector form it replaces
            val maxSel = array_max(transform(typedLit(selVecs.toSeq),
              v => coalesce(NumFunctions.roundNz(VectorFunctions
                .cosineSimilarity(col("cvec"), v), 6), lit(0.0)).cast(dec)))
            lit(lamNum) * col("sq") - lit(lamDen - lamNum) * maxSel
          }
        val rest = excludePicked(base, picked.map(_._2).toSeq)
        val best = rest.select(col("cid"), score.as("sc"), col("cvec"))
          .orderBy(col("sc").desc, col("cid").asc).limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val row = best(0)
          picked += ((r.toLong, row.getLong(0),
            row.getDecimal(1).movePointRight(6).longValueExact))
          selVecs += row.getAs[scala.collection.Seq[Any]](2)
            .map { case f: Float => f.toDouble; case d: Double => d }.toSeq
          r += 1
        }
      }
    } finally base.unpersist(blocking = false)

    import spark.implicits._
    picked.toSeq.toDF("sel_rank", "vec_id", "score_micros")
  }
}
