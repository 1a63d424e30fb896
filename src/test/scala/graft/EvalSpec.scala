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
}
