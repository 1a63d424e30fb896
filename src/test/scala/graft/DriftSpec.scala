package graft

import graft.operators.Drift

/** [[graft.operators.Drift]] — PSI drift profiling: reference-decile
  * binning, zero-drift baseline, directional shift detection, and the
  * empty-bin (null psi_term) presentation.
  */
class DriftSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def feat(rows: Seq[Double]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "grp", "value")

  test("identical distributions profile to zero PSI in every bin") {
    val ref = feat((1 to 100).map(_.toDouble))
    val rows = Drift.psiProfile(ref, ref, "grp", "value")
      .select("bin", "n_ref", "n_cur", "psi_term")
      .as[(Int, Long, Long, Option[Double])].collect()
    assert(rows.length === 10, "10 decile bins")
    assert(rows.forall { case (_, nr, nc, _) => nr === nc })
    assert(rows.forall(_._4.contains(0.0)), s"nonzero psi term in $rows")
    // reference deciles hold ~10% each by construction
    assert(rows.forall { case (_, nr, _, _) => nr === 10L })
  }

  test("a shifted current batch yields positive total PSI") {
    val ref = feat((1 to 100).map(_.toDouble))
    val cur = feat((1 to 100).map(_.toDouble + 40.0)) // shift right
    val terms = Drift.psiProfile(ref, cur, "grp", "value")
      .select("psi_term").as[Option[Double]].collect().flatten
    assert(terms.sum > 0.1, s"shift not detected: ${terms.toSeq}")
  }

  test("bins empty on one side surface with a null psi_term, not an error") {
    val ref = feat((1 to 100).map(_.toDouble))
    val cur = feat(Seq.fill(50)(1000.0)) // everything lands in bin 9
    val rows = Drift.psiProfile(ref, cur, "grp", "value")
      .select("bin", "n_cur", "psi_term")
      .as[(Int, Long, Option[Double])].collect().sortBy(_._1)
    assert(rows.count(_._2 === 0L) === 9, "current is empty in 9 of 10 bins")
    assert(rows.filter(_._2 === 0L).forall(_._3.isEmpty),
      "empty-side bins must carry null psi_term")
    assert(rows.last._2 === 50L)
  }

  test("ksProfile: identical distributions give D = 0; disjoint ones give D = 0.9") {
    val ref = feat((1 to 100).map(_.toDouble))
    val same = Drift.ksProfile(ref, ref, "grp", "value")
      .as[(String, Double, Long, Long)].collect().toSeq
    assert(same === Seq(("g", 0.0, 100L, 100L)))
    // everything current lands in the top bin: the CDFs separate
    // maximally at bin 8's edge — F_ref = 0.9 vs F_cur = 0.0
    val far = Drift.ksProfile(ref, feat(Seq.fill(40)(1000.0)), "grp", "value")
      .as[(String, Double, Long, Long)].collect().toSeq
    assert(far === Seq(("g", 0.9, 100L, 40L)))
  }

  test("ksProfile: a median shift moves D by the shifted mass share") {
    // current = reference + 40: 40 % of the mass crosses the old deciles.
    // At the bin-6 edge (value 70): F_ref = 0.7, F_cur = 0.3 → D = 0.4.
    val ref = feat((1 to 100).map(_.toDouble))
    val cur = feat((1 to 100).map(_.toDouble + 40.0))
    val got = Drift.ksProfile(ref, cur, "grp", "value")
      .select("ks_d").as[Double].collect().head
    assert(got === 0.4, s"expected D = 0.4, got $got")
  }

  test("streams compose: per-micro-batch drift vs a static reference (foreachBatch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val ref = feat((1 to 100).map(_.toDouble))
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val input = MemoryStream[Double]
    val q = input.toDS().toDF("value")
      .withColumn("grp", org.apache.spark.sql.functions.lit("g"))
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // the deployment shape: each incoming load profiled against the
        // pinned reference before it is trusted into the lake
        val psi = Drift.psiProfile(ref, batch, "grp", "value")
          .agg(org.apache.spark.sql.functions.sum("psi_term"))
          .as[Option[Double]].collect().head.getOrElse(0.0)
        seen.synchronized { seen += ((id, psi)) }
        ()
      }.start()
    try {
      input.addData((1 to 100).map(_.toDouble): _*) // matches reference
      q.processAllAvailable()
      input.addData(Seq.fill(100)(999.0): _*)       // wildly drifted
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = seen.toMap
    assert(math.abs(byBatch(0L)) < 1e-6, s"in-distribution batch drifted: $byBatch")
    assert(byBatch(1L) > 1.0, s"drifted batch not flagged: $byBatch")
  }

  test("madOutliers: hand-computed median/MAD and the 3-MAD outlier count") {
    // values 1..9 plus one gross outlier: med = 5.5, devs sorted give
    // MAD = 2.5, threshold 7.5 — only the 100.0 row (dev 94.5) exceeds it
    val df = feat((1 to 9).map(_.toDouble) :+ 100.0)
    val rows = Drift.madOutliers(df, "grp", "value")
      .select("n", "n_outliers", "med_r", "mad_r")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.toSeq === Seq((10L, 1L, 5.5, 2.5)))
  }

  test("madOutliers: outliers cannot drag the threshold (50% breakdown)") {
    // half the mass at gross values: median/MAD stay anchored to the
    // clean half, unlike mean±kσ which would absorb the corruption
    val clean = (1 to 10).map(_.toDouble)
    val corrupt = Seq.fill(8)(1e9)
    val rows = Drift.madOutliers(feat(clean ++ corrupt), "grp", "value")
      .select("n_outliers", "med_r").as[(Long, Double)].collect()
    val (nOut, med) = rows.head
    assert(med <= 10.0, s"median dragged to $med")
    assert(nOut === 8L, s"expected the 8 corrupt rows flagged, got $nOut")
  }

  test("w1Profile: identical samples give 0; a constant shift gives exactly the shift") {
    val ref = feat((1 to 50).map(_.toDouble))
    val zero = Drift.w1Profile(ref, ref, "grp", "value")
      .as[(String, Double, Long, Long)].collect().toSeq
    assert(zero === Seq(("g", 0.0, 50L, 50L)))
    // W1 between X and X+c is exactly c (mass moves distance c)
    val cur = feat((1 to 50).map(_ + 7.25))
    val shift = Drift.w1Profile(ref, cur, "grp", "value")
      .as[(String, Double, Long, Long)].collect().head
    assert(shift._2 === 7.25)
  }

  test("w1Profile: hand-computed two-point transport") {
    // ref: all mass at 0; cur: half at 0, half at 4 → W1 = 0.5·4 = 2
    val ref = Seq((1L, "g", 0.0), (2L, "g", 0.0)).toDF("id", "grp", "value")
    val cur = Seq((3L, "g", 0.0), (4L, "g", 4.0)).toDF("id", "grp", "value")
    val got = Drift.w1Profile(ref, cur, "grp", "value")
      .as[(String, Double, Long, Long)].collect().head
    assert(got === (("g", 2.0, 2L, 2L)))
  }

  test("w1Profile: one-sided groups are omitted; nulls and NaN excluded") {
    val ref = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "only_ref", 5.0))
      .toDF("id", "grp", "value")
    val cur = Seq((4L, "a", 1.0), (5L, "a", Double.NaN),
      (6L, "a", 2.0)).toDF("id", "grp", "value")
    val got = Drift.w1Profile(ref, cur, "grp", "value")
      .as[(String, Double, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 0.0, 2L, 2L)))
  }

  test("w1Profile: constant-and-equal group present in both samples emits w1 = 0") {
    // singleton shared support: W1 = 0 is well-defined and the group
    // must NOT vanish (only one-sided groups are omitted)
    val ref = Seq((1L, "const", 3.5), (2L, "const", 3.5), (3L, "b", 1.0),
      (4L, "b", 2.0)).toDF("id", "grp", "value")
    val cur = Seq((5L, "const", 3.5), (6L, "b", 1.0), (7L, "b", 3.0))
      .toDF("id", "grp", "value")
    val got = Drift.w1Profile(ref, cur, "grp", "value")
      .as[(String, Double, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) === Seq("b", "const"))
    assert(got(1) === (("const", 0.0, 2L, 1L)))
  }

  test("w1Profile: rows collapse to distinct values before any window (partition spec present)") {
    val ref = feat((1 to 200).map(i => (i % 10).toDouble))
    val cur = feat((1 to 200).map(i => (i % 7).toDouble))
    val qe = Drift.w1Profile(ref, cur, "grp", "value").queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Window [") ||
      !plan.contains("windowspecdefinition()"), "windows must carry a partition spec")
    // the window input is the distinct-value table: aggregates run below the window
    val windowIdx = plan.indexOf("Window")
    val aggIdx = plan.lastIndexOf("HashAggregate")
    assert(windowIdx >= 0 && aggIdx > windowIdx,
      s"per-(group,value) aggregate must sit below the window:\n$plan")
  }

  test("cutoffs come from the reference only — current cannot move bin edges") {
    val ref = feat((1 to 100).map(_.toDouble))
    val curA = feat((1 to 100).map(_.toDouble))
    val curB = feat((1 to 100).map(_ * 1000.0))
    def refCounts(cur: org.apache.spark.sql.DataFrame) =
      Drift.psiProfile(ref, cur, "grp", "value")
        .select("bin", "n_ref").as[(Int, Long)].collect().toMap
    assert(refCounts(curA) === refCounts(curB),
      "reference bin counts must not depend on the current batch")
  }

  test("chiSquareHomogeneity: identical loads score 0, a collapsed load fires the gate, empty side is null") {
    val ref = feat((1 to 100).map(_.toDouble))
    // identical distributions: every expected count equals the observed
    // count exactly → every frozen contribution is 0 → χ² = 0
    val same = Drift.chiSquareHomogeneity(ref,
      feat((1 to 100).map(_.toDouble)), "grp", "value").collect().head
    assert((same.getLong(1), same.getLong(2), same.getLong(3),
      same.getDouble(4), same.getBoolean(5)) === ((100L, 100L, 10L, 0.0, false)))
    // the whole current load collapsed into the top bin: far beyond
    // the df-9 critical value
    val shifted = Drift.chiSquareHomogeneity(ref,
      feat((1 to 100).map(_ => 1e6)), "grp", "value").collect().head
    assert(shifted.getDouble(4) > 16.918978 && shifted.getBoolean(5))
    // a group with no current rows has no sampling test to run
    val emptyCur = Drift.chiSquareHomogeneity(ref,
      feat(Seq.empty), "grp", "value").collect().head
    assert(emptyCur.isNullAt(4))
  }
}
