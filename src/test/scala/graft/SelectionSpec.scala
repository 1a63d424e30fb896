package graft

import org.apache.spark.sql.functions._
import graft.operators.Selection

/** [[graft.operators.Selection.facilityLocation]] — greedy submodular
  * selection: exact equality with a driver-side greedy witness,
  * diversity over duplicates, partitioning invariance, exhaustion, and
  * cache hygiene.
  */
class SelectionSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  /** exact micro-unit greedy witness mirroring the operator: 6-dp
    * rounded cosines, cover clipped at 0, tie-break on smallest id. */
  private def brute(cands: Seq[(Long, Array[Double])],
                    tgts: Seq[(Long, Array[Double])],
                    k: Int): Seq[(Long, Long, Long)] = {
    def cosMicros(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      new java.math.BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact
    }
    val ts = tgts.sortBy(_._1)
    val sims = cands.map { case (cid, v) =>
      cid -> ts.map(t => cosMicros(v, t._2)).toArray
    }.toMap
    var cover = Array.fill(ts.length)(0L)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val left = scala.collection.mutable.SortedSet(cands.map(_._1): _*)
    var r = 1
    while (r <= k && left.nonEmpty) {
      val (bestId, bestGain) = left.toSeq
        .map(c => (c, sims(c).zip(cover).map { case (s, cv) =>
          math.max(s, cv) - cv }.sum))
        .maxBy { case (c, g) => (g, -c) }
      cover = sims(bestId).zip(cover).map { case (s, cv) => math.max(s, cv) }
      out += ((r.toLong, bestId, bestGain))
      left -= bestId
      r += 1
    }
    out.toSeq
  }

  // planted geometry on near-orthogonal axes: cluster A targets point
  // along axis 0, cluster B along axis 1; candidates 1/2 are A-pointing
  // near-twins, 3 points at B, the rest live on axes 3..7 (≈ orthogonal
  // to every target, so their coverage gain is marginal)
  private def axisVec(axis: Int, jitterAxis: Int, jitter: Double,
                      dim: Int = 8): Array[Double] = {
    val v = Array.fill(dim)(0.01)
    v(axis) = 1.0
    v(jitterAxis) += jitter
    v
  }
  private val tgts: Seq[(Long, Array[Double])] =
    (0 until 3).map(i => (100L + i, axisVec(0, 2, 0.001 * (i + 1)))) ++
      (3 until 6).map(i => (100L + i, axisVec(1, 2, 0.001 * (i + 1))))
  private val cands: Seq[(Long, Array[Double])] = Seq(
    1L -> axisVec(0, 2, 0.020), 2L -> axisVec(0, 2, 0.021),
    3L -> axisVec(1, 2, 0.020)) ++
    (4L to 40L).map(i => i -> axisVec(3 + (i % 5).toInt, 2, 0.001 * i))

  private def run(k: Int, repart: Int = 0): Seq[(Long, Long, Long)] = {
    var c = cands.toDF("vec_id", "embedding")
    if (repart > 0) c = c.repartition(repart)
    Selection.facilityLocation(c, tgts.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
  }

  test("greedy selection equals the exact micro-unit witness") {
    val got = run(5)
    val want = brute(cands, tgts, 5)
    assert(got === want)
  }

  test("diversity: the twin of pick 1 is not pick 2 — the cross-cluster candidate is") {
    val got = run(3)
    // candidates 1 and 2 are near-identical and best for cluster A; a
    // pure top-k-by-similarity would take both. Facility location must
    // take the cluster-B cover (candidate 3) second.
    assert(got(0)._2 === 1L, s"pick 1 should be the cluster-A candidate: $got")
    assert(got(1)._2 === 3L,
      s"pick 2 must cover cluster B, not duplicate cluster A: $got")
    // the twin's marginal value collapses once its cluster is covered:
    // whatever is picked third gains ~nothing next to the first pick
    assert(got(2)._3 * 100 < got(0)._3,
      s"third pick's marginal gain should be marginal: $got")
  }

  test("selection is invariant under adversarial repartitioning") {
    assert(run(6, repart = 13) === run(6, repart = 1))
  }

  test("k beyond the candidate pool exhausts it in id-stable order") {
    val small = cands.take(4)
    val got = Selection.facilityLocation(small.toDF("vec_id", "embedding"),
        tgts.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.length === 4)
    assert(got.map(_._2).toSet === small.map(_._1).toSet)
    assert(got === brute(small, tgts, 10))
  }

  /** exact micro-unit MMR witness: 6-dp sims, λ-scaled integer score
    * `lamNum·sq − (lamDen−lamNum)·maxSel`, ties to the smallest id. */
  private def bruteMmr(cands: Seq[(Long, Array[Double])], q: Array[Double],
                       k: Int, lamNum: Int, lamDen: Int)
      : Seq[(Long, Long, Long)] = {
    def cosMicros(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      new java.math.BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact
    }
    val sq = cands.map { case (id, v) => id -> cosMicros(v, q) }.toMap
    val vecs = cands.toMap
    val left = scala.collection.mutable.SortedSet(cands.map(_._1): _*)
    val sel = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var r = 1
    while (r <= k && left.nonEmpty) {
      val (bid, bsc) = left.toSeq.map { c =>
        val red = if (sel.isEmpty) 0L
          else sel.map(s => cosMicros(vecs(c), vecs(s))).max
        val sc = if (sel.isEmpty) lamNum.toLong * sq(c)
          else lamNum.toLong * sq(c) - (lamDen - lamNum).toLong * red
        (c, sc)
      }.maxBy { case (c, sc) => (sc, -c) }
      out += ((r.toLong, bid, bsc)); sel += bid; left -= bid; r += 1
    }
    out.toSeq
  }

  test("mmr equals the exact micro-unit witness and diversifies the redundant head") {
    // the query straddles two topics (axes 0 and 1); candidates 1/2
    // are axis-0 near-twins, candidate 3 covers axis 1 — equally
    // relevant but different. Pure top-k takes both twins; MMR's
    // redundancy penalty must take the axis-1 candidate second.
    val q = axisVec(0, 2, 0.0); q(1) = 1.0
    val pool: Seq[(Long, Array[Double])] = Seq(
      1L -> axisVec(0, 2, 0.020), 2L -> axisVec(0, 2, 0.021),
      3L -> axisVec(1, 2, 0.020)) ++
      (4L to 30L).map(i => i -> axisVec(3 + (i % 5).toInt, 2, 0.001 * i))
    val got = Selection.mmr(pool.toDF("vec_id", "embedding"),
        Seq((0L, q)).toDF("vec_id", "embedding"), "vec_id", "embedding",
        k = 4, lamNum = 7, lamDen = 10)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val want = bruteMmr(pool, q, 4, 7, 10)
    assert(got === want)
    assert(got(0)._2 === 1L, s"pick 1 is the most relevant: $got")
    assert(got(1)._2 === 3L,
      s"pick 2 must be the diverse mixed vector, not the redundant twin: $got")
  }

  test("mmr at lambda = 1 degenerates to pure relevance order") {
    val q = axisVec(0, 2, 0.0)
    val pool = cands
    val got = Selection.mmr(pool.toDF("vec_id", "embedding"),
        Seq((0L, q)).toDF("vec_id", "embedding"), "vec_id", "embedding",
        k = 5, lamNum = 1, lamDen = 1)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === bruteMmr(pool, q, 5, 1, 1))
    // with no redundancy penalty the ranks are the simQ descending order
    val bySq = bruteMmr(pool, q, pool.length, 1, 1).map(_._2)
    assert(got.map(_._2) === bySq.take(5))
  }

  test("mmr rejects a multi-row query and exhausts a small pool") {
    intercept[IllegalArgumentException] {
      Selection.mmr(cands.toDF("vec_id", "embedding"),
        cands.take(2).toDF("vec_id", "embedding"), "vec_id", "embedding", 3)
    }
    val small = cands.take(3)
    val got = Selection.mmr(small.toDF("vec_id", "embedding"),
        Seq((0L, axisVec(0, 2, 0.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 10)
      .as[(Long, Long, Long)].collect()
    assert(got.length === 3)
  }

  /** exact micro-unit k-center witness: smallest-id seed, then argmax
    * of min (1 − cos6) distance to selected, ties to smallest id. */
  private def bruteKc(cands: Seq[(Long, Array[Double])], k: Int)
      : Seq[(Long, Long, Long)] = {
    def distMicros(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      1000000L - new java.math.BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact
    }
    val vecs = cands.toMap
    val left = scala.collection.mutable.SortedSet(cands.map(_._1): _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val seed = left.head
    out += ((1L, seed, 2000000L)); left -= seed
    var r = 2
    while (r <= k && left.nonEmpty) {
      val (bid, bd) = left.toSeq
        .map(c => (c, out.map(s => distMicros(vecs(c), vecs(s._2))).min))
        .maxBy { case (c, d) => (d, -c) }
      out += ((r.toLong, bid, bd)); left -= bid; r += 1
    }
    out.toSeq
  }

  test("kcenter equals the exact micro-unit witness and spreads across clusters") {
    val got = Selection.kcenter(cands.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 5)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === bruteKc(cands, 5))
    // the seed is the smallest id; pick 2 must leave the seed's axis
    // cluster entirely (candidates 1/2 are near-twins on axis 0 — a
    // farthest-point pick never takes the twin while other axes exist)
    assert(got(0)._2 === 1L && got(0)._3 === 2000000L)
    assert(got.map(_._2).take(4).toSet.intersect(Set(2L)).isEmpty,
      s"the seed's near-twin must not be an early pick: $got")
    // radii are non-increasing after the seed row (greedy k-center
    // monotonicity: every later pick is at most as far from the
    // selected set as earlier ones)
    val radii = got.drop(1).map(_._3)
    assert(radii === radii.sorted.reverse, s"radii must be non-increasing: $got")
  }

  test("kcenter exhausts a small pool and is repartition-invariant") {
    val small = cands.take(3)
    val got = Selection.kcenter(small.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.length === 3 && got.map(_._2).toSet === small.map(_._1).toSet)
    val a = Selection.kcenter(cands.toDF("vec_id", "embedding")
        .repartition(13), "vec_id", "embedding", k = 6)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val b = Selection.kcenter(cands.toDF("vec_id", "embedding")
        .repartition(1), "vec_id", "embedding", k = 6)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(a === b)
  }

  test("cover literal path ≡ broadcast-join path, bit for bit") {
    // coverLiteralMax = 0 forces every round through the broadcast
    // one-row cover frame; the default (nT = 6 ≤ 1024) stays on the
    // single-literal path. Same input must produce identical rows.
    val viaJoin = Selection.facilityLocation(cands.toDF("vec_id", "embedding"),
        tgts.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 6,
        coverLiteralMax = 0)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(viaJoin === run(6), "join path must equal literal path")
    assert(viaJoin === brute(cands, tgts, 6), "and both equal the witness")
  }

  test("excludePicked: anti-join exclusion ≡ isin exclusion, and k is metadata-bounded") {
    // the greedy rounds exclude picked ids via a broadcast left-anti
    // join (O(1) plan per round); the growing-isin form it replaced
    // must produce the identical frame
    val df = (1L to 50L).map(i => (i, i * 2)).toDF("cid", "v")
    val ids = Seq(3L, 17L, 42L)
    val viaAnti = Selection.excludePicked(df, ids, antiJoin = Some(true))
      .as[(Long, Long)].collect().toSet
    val viaIsin = Selection.excludePicked(df, ids, antiJoin = Some(false))
      .as[(Long, Long)].collect().toSet
    assert(viaAnti === viaIsin)
    assert(viaAnti.map(_._1).intersect(ids.toSet).isEmpty)
    assert(Selection.excludePicked(df, Nil).count() === 50L)
    // the adaptive default crosses to the anti-join above isinMax
    val many = (1L to Selection.isinMax + 1L).toSeq
    assert(Selection.excludePicked(df, many).count() === 50L - many.length)
    assert(Selection.excludePicked(df, many)
      .queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "large picked sets must route through the broadcast anti-join")
    assert(!Selection.excludePicked(df, ids)
      .queryExecution.executedPlan.toString.contains("Join"),
      "small picked sets must stay on the isin filter")
    // the metadata-bounded-rounds contract is enforced, not just documented
    val ex = intercept[IllegalArgumentException] {
      Selection.kcenter(cands.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 5000)
    }
    assert(ex.getMessage.contains("metadata-bounded"))
    intercept[IllegalArgumentException] {
      Selection.mmr(cands.toDF("vec_id", "embedding"),
        tgts.toDF("vec_id", "embedding").limit(1), "vec_id", "embedding",
        k = 999999)
    }
    intercept[IllegalArgumentException] {
      Selection.facilityLocation(cands.toDF("vec_id", "embedding"),
        tgts.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 4097)
    }
  }

  test("facilityLocation leaves no candidate-scale blocks cached after returning") {
    val before = sp.sparkContext.getPersistentRDDs.keySet
    run(3)
    val added = sp.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.isEmpty, s"leaked cached RDDs: $added")
  }
}
