package graft

import graft.operators.Eval

/** [[graft.operators.Eval.classificationReport]] — hand-computed
  * confusion arithmetic, zero-division conventions, and class coverage
  * (a class appearing only in predictions still gets a row).
  */
class EvalSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("bootstrapMeanCI equals the driver-side md5 replay; constant metric collapses the band") {
    // plain-Scala witness: same md5 draw indices over the id-order
    // positions, same exact-integer sums, same percentile rule
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val vals = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L)
    val rows = vals.zipWithIndex.map { case (v, i) => ((i + 1).toLong * 7, v) }
    val df = rows.toDF("doc_id", "metric")
    val b = 50
    val byPos = rows.sortBy(_._1).map(_._2) // id order = position order
    val n = byPos.length
    val means = (1 to b).map { bb =>
      val s = (1 to n).map { i =>
        val idx = (java.lang.Long.parseLong(
          md5hex(s"bs:$bb:$i").substring(0, 8), 16) % n).toInt
        byPos(idx)
      }.sum
      BigDecimal(s.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.sorted
    def pct(q: Int): Double = means((b * q + 99) / 100 - 1)
    val got = Eval.bootstrapMeanCI(df, "doc_id", "metric",
        numResamples = b, qPcts = Seq(5, 50, 95))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    Seq(5, 50, 95).foreach { q =>
      assert(got(q.toLong) === ((n.toLong, b.toLong, pct(q))), s"q=$q diverged")
    }
    assert(got(5L)._3 <= got(50L)._3 && got(50L)._3 <= got(95L)._3)
    // constant metric: every resample mean is the constant — band width 0
    val const = (1L to 20L).map(i => (i, 42L)).toDF("doc_id", "metric")
    val cg = Eval.bootstrapMeanCI(const, "doc_id", "metric",
        numResamples = 25, qPcts = Seq(5, 95))
      .as[(Long, Long, Long, Double)].collect().map(_._4).toSet
    assert(cg === Set(42.0))
  }

  test("bootstrapMeanCIPooled equals the driver-side Poisson replay; band agrees with the exact grid") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // same integer Poisson(1) CDF table the operator embeds
    val thr = Seq(367879L, 735759L, 919699L, 981012L, 996340L,
      999406L, 999917L, 999990L, 999999L)
    val rows = (1L to 40L).map(i => (i * 3, i * 10 % 97))
    val df = rows.toDF("doc_id", "metric")
    val b = 60
    // plain-Scala witness: md5(bsp:b:id) mod 1e6 → threshold lookup →
    // weighted mean per resample → order-statistic percentiles
    val means = (1 to b).flatMap { bb =>
      val (s, c) = rows.foldLeft((0L, 0L)) { case ((s, c), (id, v)) =>
        val u = java.lang.Long.parseLong(
          md5hex(s"bsp:$bb:$id").substring(0, 8), 16) % 1000000L
        val w = thr.count(_ <= u).toLong
        (s + w * v, c + w)
      }
      if (c > 0) Some(BigDecimal(s.toDouble / c)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
    }.sorted
    val r = means.length
    def pct(q: Int): Double = means((r * q + 99) / 100 - 1)
    val got = Eval.bootstrapMeanCIPooled(df, "doc_id", "metric",
        numResamples = b, qPcts = Seq(5, 50, 95))
      .as[(Long, Long, Long, Double)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    Seq(5, 50, 95).foreach { q =>
      assert(got(q.toLong) === ((40L, r.toLong, pct(q))), s"q=$q diverged")
    }
    // the Poisson band approximates the exact multinomial band: same
    // center to within the band width, positive overlapping width
    val exact = Eval.bootstrapMeanCI(df, "doc_id", "metric",
        numResamples = b, qPcts = Seq(5, 50, 95))
      .as[(Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x._4).toMap
    val wP = got(95L)._3 - got(5L)._3
    val wE = exact(95L) - exact(5L)
    assert(wP > 0 && wE > 0)
    assert(math.abs(got(50L)._3 - exact(50L)) < math.max(wP, wE),
      s"pooled median ${got(50L)._3} vs exact ${exact(50L)} " +
        s"beyond band width ${math.max(wP, wE)}")
    assert(wP < 3 * wE && wE < 3 * wP,
      s"band widths diverge: pooled $wP vs exact $wE")
    // constant metric: weighted mean of a constant is the constant —
    // band collapses exactly (zero-weight resamples drop, never skew)
    val const = (1L to 20L).map(i => (i, 42L)).toDF("doc_id", "metric")
    val cg = Eval.bootstrapMeanCIPooled(const, "doc_id", "metric",
        numResamples = 25, qPcts = Seq(5, 95))
      .as[(Long, Long, Long, Double)].collect().map(_._4).toSet
    assert(cg === Set(42.0))
    // empty corpus: empty frame (the documented pooled-twin contract)
    assert(Eval.bootstrapMeanCIPooled(
      Seq.empty[(Long, Long)].toDF("doc_id", "metric"),
      "doc_id", "metric", numResamples = 5).count() === 0L)
  }

  test("mcnemarGate: hand-computed discordant z, agreement gives z = 0") {
    // group g1: 12 docs — a-only 9, b-only 1, both 2:
    //   n_ab = 9, n_ba = 1 → z = 8/sqrt(10) ≈ 2.529822 → significant
    // group g2: both filters agree on every doc → z = 0, insignificant
    val rows =
      (1 to 9).map(i => ("g1", true, false)) ++
      Seq(("g1", false, true)) ++
      (1 to 2).map(_ => ("g1", true, true)) ++
      Seq(("g2", true, true), ("g2", false, false), ("g2", true, true))
    val df = rows.toDF("grp0", "a", "b")
    import org.apache.spark.sql.functions.col
    val got = Eval.mcnemarGate(df, "grp0", col("a"), col("b"))
      .as[(String, Long, Long, Long, Long, Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    val z = BigDecimal(8.0 / math.sqrt(10.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("g1") === (("g1", 12L, 11L, 3L, 9L, 1L, z, true)))
    assert(got("g2") === (("g2", 3L, 2L, 2L, 0L, 0L, 0.0, false)))
  }

  test("classificationReport: hand-computed precision/recall/f1") {
    // labels: a×3, b×2; preds: a correct 2/3, one a→b; b correct 1/2, one b→a
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "a")).toDF("label", "pred")
    val got = Eval.classificationReport(df, "label", "pred")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // a: support 3, predicted 3, tp 2 → p = r = 2/3, f1 = 2/3
    val pa = 2.0 / 3
    assert(got("a") === ((3L, 3L, 2L,
      math.round(pa * 1e6) / 1e6, math.round(pa * 1e6) / 1e6,
      math.round(2 * pa * pa / (pa + pa) * 1e6) / 1e6)))
    // b: support 2, predicted 2, tp 1 → p = r = f1 = 0.5
    assert(got("b") === ((2L, 2L, 1L, 0.5, 0.5, 0.5)))
  }

  test("classificationReport: prediction-only and label-only classes get rows; zero conventions") {
    val df = Seq(("a", "c"), ("a", "a")).toDF("label", "pred")
    val got = Eval.classificationReport(df, "label", "pred")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got("c") === ((0L, 1L, 0L, 0.0, 0.0, 0.0)),
      "class only ever predicted: support 0, precision 0 (zero-division=0)")
    assert(got("a") === ((2L, 1L, 1L, 1.0, 0.5, math.round(2.0 / 3 * 1e6) / 1e6)))
  }

  test("calibrationBuckets: integer bucket cuts, exact means and rates") {
    val df = Seq(
      (50000L, 0L),   // bucket 0
      (99999L, 1L),   // bucket 0 (boundary stays below)
      (100000L, 0L),  // bucket 1 (boundary promotes)
      (950000L, 1L),  // bucket 9
      (1000000L, 1L)  // p = 1.0 clamps into bucket 9
    ).toDF("p_units", "y")
    val got = Eval.calibrationBuckets(df, "p_units", "y")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(0L) === ((2L, math.round(149999.0 / 2 / 1000000 * 1e6) / 1e6, 0.5)))
    assert(got(1L) === ((1L, 0.1, 0.0)))
    assert(got(9L) === ((2L, 0.975, 1.0)))
    assert(got.keySet === Set(0L, 1L, 9L))
  }

  test("calibrationBuckets: bucket width must divide the scale") {
    val df = Seq((1L, 0L)).toDF("p_units", "y")
    intercept[IllegalArgumentException] {
      Eval.calibrationBuckets(df, "p_units", "y", buckets = 7)
    }
  }

  test("uncertaintyTopK: ascending integer margin with id tie-break, k cut") {
    val df = Seq(
      ("a", 500000L),  // margin 0
      ("b", 400000L),  // margin 100000
      ("c", 600000L),  // margin 100000 — ties with b, id order decides
      ("d", 10000L),   // margin 490000
      ("e", 990000L)   // margin 490000
    ).toDF("id", "p_units")
    val got = Eval.uncertaintyTopK(df, "id", "p_units", k = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 500000L, 0L), ("b", 400000L, 100000L),
      ("c", 600000L, 100000L)))
  }

  test("binaryScoreEval: perfect separation gives AUC 1, reversal gives 0, ties midrank to 0.5") {
    def auc(rows: Seq[(Long, Long)]): Option[Double] = {
      val r = Eval.binaryScoreEval(rows.toDF("p_units", "y"), "p_units", "y")
        .collect().head
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    }
    assert(auc(Seq((900000L, 1L), (800000L, 1L), (100000L, 0L))) === Some(1.0))
    assert(auc(Seq((100000L, 1L), (900000L, 0L))) === Some(0.0))
    // every score tied → all pairs count half → AUC exactly 0.5
    assert(auc(Seq((500000L, 1L), (500000L, 0L), (500000L, 1L), (500000L, 0L)))
      === Some(0.5))
    // single-class input: AUC undefined (null)
    assert(auc(Seq((500000L, 1L), (900000L, 1L))) === None)
  }

  test("binaryScoreEval: hand-computed mixed ranking with a tie") {
    // scores desc: 0.9(+), 0.6(+ and −  tied), 0.2(−)
    // pairs: (0.9+,0.6−)=1, (0.9+,0.2−)=1, (0.6+,0.6−)=0.5, (0.6+,0.2−)=1
    // AUC = 3.5 / 4 = 0.875
    val df = Seq((900000L, 1L), (600000L, 1L), (600000L, 0L), (200000L, 0L))
      .toDF("p_units", "y")
    val r = Eval.binaryScoreEval(df, "p_units", "y").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    assert(r.getDouble(2) === 0.875)
    // Brier: (0.9−1)² + (0.6−1)² + 0.6² + 0.2² = 0.01+0.16+0.36+0.04 = 0.57/4
    assert(r.getDouble(3) === 0.1425)
  }

  test("classificationReport: rows collapse to confusion cells before any per-class work") {
    val df = (1 to 400).map(i => (s"c${i % 3}", s"c${i % 4 % 3}"))
      .toDF("label", "pred")
    val rep = Eval.classificationReport(df, "label", "pred")
    assert(rep.count() === 3)
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no windows in the report plan:\n$plan")
  }

  test("fleissKappa: textbook integer arithmetic, incomplete items dropped, degenerate groups") {
    // group g: 3 items × 2 raters — (A,A), (A,B), (B,B).
    //   S2 = 4 + 2 + 4 = 10; c_A = c_B = 3 → Cs = 18; N = 3, n = 2.
    //   P̄ = 2/3, P̄e = 1/2 → kappa = (2/3 − 1/2)/(1/2) = 1/3.
    // group h: one item rated by ONE rater only → dropped, null kappa.
    // group k: every rating in one category → P̄e = 1 → kappa 1.0.
    val rows = Seq(
      ("g", 1L, 1, "A"), ("g", 1L, 2, "A"),
      ("g", 2L, 1, "A"), ("g", 2L, 2, "B"),
      ("g", 3L, 1, "B"), ("g", 3L, 2, "B"),
      ("h", 9L, 1, "A"),
      ("k", 5L, 1, "X"), ("k", 5L, 2, "X"),
      ("k", 6L, 1, "X"), ("k", 6L, 2, "X"))
    val got = Eval.fleissKappa(rows.toDF("grp0", "item", "rater", "lab"),
        "grp0", "item", "rater", "lab", ratersPerItem = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got("g") === ((3L, 0L, 2L, Some(0.333333))))
    assert(got("h") === ((0L, 1L, 0L, None)))
    assert(got("k") === ((2L, 0L, 1L, Some(1.0))))
    // a DUPLICATED rating from one rater plus a missing rater has the
    // right ratings COUNT but the wrong panel — dropped, not scored
    val dup = Seq(("d", 1L, 1, "A"), ("d", 1L, 1, "A"),
      ("d", 2L, 1, "A"), ("d", 2L, 2, "B"))
    val gotD = Eval.fleissKappa(dup.toDF("grp0", "item", "rater", "lab"),
      "grp0", "item", "rater", "lab", 2).collect().head
    assert((gotD.getLong(1), gotD.getLong(2)) === ((1L, 1L)),
      "replayed single-rater ratings must not masquerade as a panel")
    // panel-size contract enforced
    intercept[IllegalArgumentException] {
      Eval.fleissKappa(rows.toDF("g", "i", "r", "l"), "g", "i", "r", "l", 1)
    }
  }

  test("pairedPermutationTest equals the driver-side md5 sign replay; A/B swap is p-symmetric") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val a = Seq(10L, 3L, 7L, 2L, 9L, 5L)
    val b = Seq(4L, 8L, 1L, 2L, 3L, 9L)
    val ids = (1 to 6).map(_.toLong)
    val df = ids.zip(a.zip(b)).map { case (i, (x, y)) => ("g", i, x, y) }
      .toDF("grp0", "id", "a", "b")
    val ds = ids.zip(a.zip(b)).map { case (i, (x, y)) => i -> (x - y) }.toMap
    val tObs = ds.values.sum
    val perms = 25
    val nGe = (1 to perms).count { p =>
      val t = ids.map { i =>
        val bit = java.lang.Long.parseLong(
          md5hex(s"pt:$p:$i").substring(0, 8), 16) % 2
        (2 * bit - 1) * ds(i)
      }.sum
      math.abs(t) >= math.abs(tObs)
    }
    val pR = BigDecimal((nGe + 1).toDouble / (perms + 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    import org.apache.spark.sql.functions.col
    val got = Eval.pairedPermutationTest(df, "grp0", "id",
      col("a"), col("b"), numPerms = perms).collect().head
    assert((got.getString(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getDouble(4)) ===
      (("g", 6L, tObs, nGe.toLong, pR)))
    // swapping the scorers negates every total: |T| and therefore the
    // whole test is unchanged
    val swp = Eval.pairedPermutationTest(df, "grp0", "id",
      col("b"), col("a"), numPerms = perms).collect().head
    assert(swp.getLong(2) === -tObs)
    assert((swp.getLong(3), swp.getDouble(4)) === ((nGe.toLong, pR)))
  }

  test("bhFdr: hand-computed step-up, boundary-tie rejection, adjusted-p cummin") {
    // m = 5 at q = 0.05: crit_i = i·50000/5 — p(3) = 30000 sits EXACTLY
    // on 3·50000/5·10⁶ → rejected (≤, not <); k = 3 rejects ranks 1..3
    // even though nothing between them failed
    val df = Seq(("t1", 1000L), ("t2", 20000L), ("t3", 30000L),
      ("t4", 500000L), ("t5", 900000L)).toDF("test0", "p")
    val got = Eval.bhFdr(df, "test0", "p", qPpm = 50000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getBoolean(5)))).toMap
    assert(got("t1") === ((1000L, 5L, 1L, 0.005, true)))
    assert(got("t2") === ((20000L, 5L, 2L, 0.05, true)))
    assert(got("t3") === ((30000L, 5L, 3L, 0.05, true)),
      "exact boundary must reject (step-up is ≤)")
    assert(got("t4") === ((500000L, 5L, 4L, 0.625, false)))
    assert(got("t5") === ((900000L, 5L, 5L, 0.9, false)))
    // adjusted p is monotone along the rank order by construction
    val adj = got.values.toSeq.sortBy(_._3).map(_._4)
    assert(adj === adj.sorted)
  }

  test("cochranQ: reduces to McNemar z² at k = 2; hand-computed k = 3; agreement gives 0") {
    import org.apache.spark.sql.functions.col
    // the mcnemarGate fixture: 9 a-only, 1 b-only, 2 both →
    // z = 8/√10 → z² = 6.4; Cochran Q at k = 2 must equal it exactly
    val two = ((1 to 9).map(_ => ("g", true, false)) ++
      Seq(("g", false, true)) ++ (1 to 2).map(_ => ("g", true, true)))
      .toDF("grp0", "a", "b")
    val got2 = Eval.cochranQ(two, "grp0", Seq(col("a"), col("b")),
      critQ = 3.841459).collect().head
    assert((got2.getLong(1), got2.getLong(2), got2.getLong(3),
      got2.getDouble(4), got2.getBoolean(5)) === ((12L, 11L, 3L, 6.4, true)))
    // k = 3 hand example: rows (1,1,0),(1,0,0),(1,1,1) →
    // C = (3,2,1), N = 6, ΣR² = 14 → Q = 2·(42−36)/(18−14) = 3.0
    val three = Seq(("g", true, true, false), ("g", true, false, false),
      ("g", true, true, true)).toDF("grp0", "a", "b", "c")
    val got3 = Eval.cochranQ(three, "grp0",
      Seq(col("a"), col("b"), col("c"))).collect().head
    assert((got3.getLong(2), got3.getLong(3), got3.getLong(4),
      got3.getDouble(5), got3.getBoolean(6)) === ((3L, 2L, 1L, 3.0, false)))
    // full agreement (all versions pass everything) → denominator 0 → Q = 0
    val agree = Seq(("g", true, true, true), ("g", true, true, true))
      .toDF("grp0", "a", "b", "c")
    assert(Eval.cochranQ(agree, "grp0", Seq(col("a"), col("b"), col("c")))
      .collect().head.getDouble(5) === 0.0)
    intercept[IllegalArgumentException] {
      Eval.cochranQ(agree, "grp0", Seq(col("a")))
    }
  }

  test("cohensD: hand-computed pooled-variance d; undefined cases are null") {
    import org.apache.spark.sql.functions.col
    // A = [1,2,3]: m = 2, Σ(x−m)² = 2; B = [4,6]: m = 5, Σ(x−m)² = 2
    // pooled = 4/3 → d = −3/√(4/3) = −2.598076…
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("g", 3L, true),
      ("g", 4L, false), ("g", 6L, false)).toDF("grp0", "x", "a")
    val got = Eval.cohensD(df, "grp0", "x", col("a")).collect().head
    val d = BigDecimal(-3.0 / math.sqrt(4.0 / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((got.getLong(1), got.getLong(2), got.getDouble(3),
      got.getDouble(4)) === ((3L, 2L, -3.0, d)))
    // a slice of one: mean diff defined, d null
    val thin = Seq(("g", 1L, true), ("g", 5L, false), ("g", 7L, false))
      .toDF("grp0", "x", "a")
    val t = Eval.cohensD(thin, "grp0", "x", col("a")).collect().head
    assert(t.getDouble(3) === -5.0 && t.isNullAt(4))
    // zero spread in both slices: d undefined (null), not ±∞
    val flat = Seq(("g", 5L, true), ("g", 5L, true),
      ("g", 5L, false), ("g", 5L, false)).toDF("grp0", "x", "a")
    assert(Eval.cohensD(flat, "grp0", "x", col("a")).collect().head.isNullAt(4))
    // null metrics drop — they must not count in a slice's n while
    // contributing nothing to its sums
    val withNull = Seq(("g", Some(1L), true), ("g", Some(3L), true),
      ("g", Option.empty[Long], true), ("g", Some(4L), false),
      ("g", Some(6L), false)).toDF("grp0", "x", "a")
    val noNull = Seq(("g", 1L, true), ("g", 3L, true),
      ("g", 4L, false), ("g", 6L, false)).toDF("grp0", "x", "a")
    assert(Eval.cohensD(withNull, "grp0", "x", col("a")).collect().toSeq ===
      Eval.cohensD(noNull, "grp0", "x", col("a")).collect().toSeq)
  }

  test("cluster bootstrap: keying the Poisson draw on the group widens the band under in-cluster correlation") {
    // two perfectly-internally-correlated clusters (all 0s vs all
    // 100s): iid resampling mixes 20 draws → tight band around 50;
    // cluster resampling draws TWO weights → the mean swings to the
    // cluster extremes
    val docs = ((1L to 10L).map(i => (i, "sA", 0L)) ++
      (11L to 20L).map(i => (i, "sB", 100L)))
      .toDF("doc_id", "src", "metric")
    def width(keyCol: String, salt: String): Double = {
      val m = Eval.bootstrapMeanCIPooled(docs, keyCol, "metric",
          numResamples = 100, qPcts = Seq(5, 95), salt = salt)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> r._4).toMap
      m(95L) - m(5L)
    }
    val iid = width("doc_id", "bsp")
    val clustered = width("src", "bspc")
    assert(clustered > iid,
      s"cluster band ($clustered) must exceed the iid band ($iid)")
    assert(clustered >= 50.0,
      s"two-cluster resampling must reach a cluster-extreme mean: $clustered")
  }

  test("krippendorffAlpha: hand-computed panels, varying sizes, exclusions surfaced") {
    // group g, 2-rater panels: (A,A), (B,B), (A,B) →
    //   D_num = 2 (the mixed item), n = 6, D_den = 3·3 + 3·3 = 18
    //   alpha = 1 − 5·2/18 = 4/9
    val g = Seq(("g", 1L, "A"), ("g", 1L, "A"), ("g", 2L, "B"),
      ("g", 2L, "B"), ("g", 3L, "A"), ("g", 3L, "B"))
    // group h, MIXED panels (what Fleiss drops): (A,A,B) and (A,B) →
    //   D_num = 4/2·2 + 2 = 4, n = 5, D_den = 3·2 + 2·3 = 12
    //   alpha = 1 − 4·4/12 = −1/3
    val h = Seq(("h", 1L, "A"), ("h", 1L, "A"), ("h", 1L, "B"),
      ("h", 2L, "A"), ("h", 2L, "B"))
    // group k: perfect single-category agreement → alpha 1.0; plus a
    // single-rating item (surfaced, excluded)
    val k = Seq(("k", 1L, "X"), ("k", 1L, "X"), ("k", 9L, "X"))
    val got = Eval.krippendorffAlpha((g ++ h ++ k).toDF("grp0", "item", "lab"),
        "grp0", "item", "lab")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    val a49 = BigDecimal(4.0 / 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val am13 = BigDecimal(-1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("g") === ((3L, 0L, 0L, 6L, Some(a49))))
    assert(got("h") === ((2L, 0L, 0L, 5L, Some(am13))))
    assert(got("k") === ((1L, 1L, 0L, 2L, Some(1.0))))
    // oversize panels excluded AND surfaced (maxRaters = 3: lcm = 2)
    val big = Seq.tabulate(4)(i => ("b", 1L, s"L$i")) ++
      Seq(("b", 2L, "A"), ("b", 2L, "B"))
    val gotB = Eval.krippendorffAlpha(big.toDF("grp0", "item", "lab"),
      "grp0", "item", "lab", maxRaters = 3).collect().head
    assert((gotB.getLong(1), gotB.getLong(2), gotB.getLong(3),
      gotB.getLong(4)) === ((1L, 0L, 1L, 2L)))
    // no pairable items at all → null alpha
    val lonely = Seq(("l", 1L, "A"), ("l", 2L, "B")).toDF("grp0", "item", "lab")
    assert(Eval.krippendorffAlpha(lonely, "grp0", "item", "lab")
      .collect().head.isNullAt(5))
  }

  test("wilcoxonSignedRank: hand-ranked ties, cleared-fraction z, sign conventions") {
    import org.apache.spark.sql.functions.col
    // d = +3, −1, +2, +2: |d| tie groups 1(t=1), 2(t=2), 3(t=1) →
    // midranks 1, 2.5, 2.5, 4 → W+ = 9 (w2 = 18), n = 4
    // z = (2·18 − 20)/√((2·180 − 6)/3) = 16/√118
    val df = Seq(("g", 13L, 10L), ("g", 9L, 10L), ("g", 12L, 10L),
      ("g", 7L, 5L)).toDF("grp0", "a", "b")
    val got = Eval.wilcoxonSignedRank(df, "grp0", col("a"), col("b"))
      .collect().head
    val z = BigDecimal(16.0 / math.sqrt(118.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((got.getLong(1), got.getLong(2), got.getDouble(3),
      got.getBoolean(4)) === ((4L, 18L, z, false)))
    // tie-free all-positive run: W2 = 30, z = 30/√220 > 1.96
    val pos = (1L to 5L).map(i => ("p", 10L + i, 10L)).toDF("grp0", "a", "b")
    val gp = Eval.wilcoxonSignedRank(pos, "grp0", col("a"), col("b"))
      .collect().head
    val zp = BigDecimal(30.0 / math.sqrt(220.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((gp.getLong(2), gp.getDouble(3), gp.getBoolean(4)) ===
      ((30L, zp, true)))
    // swapping the scorers negates z; all-zero differences drop the group
    val gn = Eval.wilcoxonSignedRank(pos, "grp0", col("b"), col("a"))
      .collect().head
    assert(gn.getDouble(3) === -zp)
    val zero = Seq(("z", 5L, 5L)).toDF("grp0", "a", "b")
    assert(Eval.wilcoxonSignedRank(zero, "grp0", col("a"), col("b"))
      .count() === 0)
  }

  test("spearmanRho: monotone ±1 exactly, tie midranks, zero-variance null") {
    // strictly increasing pairs → rho = 1 from exact integer algebra
    val up = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L))
      .toDF("grp0", "x", "y")
    assert(Eval.spearmanRho(up, "grp0", "x", "y")
      .collect().head.getDouble(2) === 1.0)
    val down = Seq(("g", 1L, 30L), ("g", 2L, 20L), ("g", 3L, 10L))
      .toDF("grp0", "x", "y")
    assert(Eval.spearmanRho(down, "grp0", "x", "y")
      .collect().head.getDouble(2) === -1.0)
    // y ties: (1,5),(2,5),(3,7) → rank2 pairs (2,3),(4,3),(6,6) →
    // rho = 18/(√24·√18)
    val tied = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 7L))
      .toDF("grp0", "x", "y")
    val rt = BigDecimal(18.0 / (math.sqrt(24.0) * math.sqrt(18.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(Eval.spearmanRho(tied, "grp0", "x", "y")
      .collect().head.getDouble(2) === rt)
    // constant metric → zero rank variance → null
    val flat = Seq(("g", 1L, 5L), ("g", 2L, 5L)).toDF("grp0", "x", "y")
    assert(Eval.spearmanRho(flat, "grp0", "x", "y")
      .collect().head.isNullAt(2))
  }

  test("kendallW: perfect/inverted orders hit 1 and 0, tie-corrected hand case, incomplete panels null") {
    // two judges, two items, same order → W = 1; reversed → W = 0
    val same = Seq(("g", 1L, 1, 10L), ("g", 2L, 1, 20L),
      ("g", 1L, 2, 5L), ("g", 2L, 2, 9L)).toDF("grp0", "item", "j", "sc")
    val g1 = Eval.kendallW(same, "grp0", "item", "j", "sc").collect().head
    assert((g1.getLong(1), g1.getLong(2), g1.getBoolean(3),
      g1.getDouble(4)) === ((2L, 2L, true, 1.0)))
    val rev = Seq(("g", 1L, 1, 10L), ("g", 2L, 1, 20L),
      ("g", 1L, 2, 9L), ("g", 2L, 2, 5L)).toDF("grp0", "item", "j", "sc")
    assert(Eval.kendallW(rev, "grp0", "item", "j", "sc")
      .collect().head.getDouble(4) === 0.0)
    // tie-corrected hand case: judge1 (1,2,3), judge2 (1,1,2) →
    // R2 = (5,7,12), ΣR2² = 218, T = 6 → W = 78/84
    val tied = Seq(("g", 1L, 1, 1L), ("g", 2L, 1, 2L), ("g", 3L, 1, 3L),
      ("g", 1L, 2, 1L), ("g", 2L, 2, 1L), ("g", 3L, 2, 2L))
      .toDF("grp0", "item", "j", "sc")
    val wt = BigDecimal(78.0 / 84)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(Eval.kendallW(tied, "grp0", "item", "j", "sc")
      .collect().head.getDouble(4) === wt)
    // a missing rating breaks the panel: surfaced, never scored
    val holes = Seq(("g", 1L, 1, 10L), ("g", 2L, 1, 20L), ("g", 1L, 2, 5L))
      .toDF("grp0", "item", "j", "sc")
    val gh = Eval.kendallW(holes, "grp0", "item", "j", "sc").collect().head
    assert(!gh.getBoolean(3) && gh.isNullAt(4))
    // a duplicated rating breaks it too
    val dup = Seq(("g", 1L, 1, 10L), ("g", 1L, 1, 11L), ("g", 2L, 1, 20L),
      ("g", 1L, 2, 5L), ("g", 2L, 2, 9L)).toDF("grp0", "item", "j", "sc")
    val gd = Eval.kendallW(dup, "grp0", "item", "j", "sc").collect().head
    assert(!gd.getBoolean(3) && gd.isNullAt(4))
  }

  test("cliffsDelta: hand-counted pairs with ties; one-slice group is null") {
    import org.apache.spark.sql.functions.col
    // A = [1,2,2], B = [1,3]: gt = 2, lt = 3, one tie → δ = −1/6
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("g", 2L, true),
      ("g", 1L, false), ("g", 3L, false)).toDF("grp0", "x", "a")
    val got = Eval.cliffsDelta(df, "grp0", "x", col("a")).collect().head
    val delta = BigDecimal(-1.0 / 6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4),
      got.getDouble(5)) === ((3L, 2L, 2L, 3L, delta)))
    // all of A above all of B → δ = 1 exactly
    val sep = Seq(("g", 9L, true), ("g", 8L, true), ("g", 1L, false))
      .toDF("grp0", "x", "a")
    assert(Eval.cliffsDelta(sep, "grp0", "x", col("a"))
      .collect().head.getDouble(5) === 1.0)
    // no B rows: delta undefined
    val solo = Seq(("g", 1L, true)).toDF("grp0", "x", "a")
    assert(Eval.cliffsDelta(solo, "grp0", "x", col("a"))
      .collect().head.isNullAt(5))
    // null metrics drop — a kept null would sort FIRST and inflate
    // every cumulative-below count
    val withNull = Seq(("g", Some(9L), true), ("g", Some(8L), true),
      ("g", Option.empty[Long], false), ("g", Some(1L), false))
      .toDF("grp0", "x", "a")
    val gotN = Eval.cliffsDelta(withNull, "grp0", "x", col("a"))
      .collect().head
    assert((gotN.getLong(1), gotN.getLong(2), gotN.getDouble(5)) ===
      ((2L, 1L, 1.0)))
  }
}
