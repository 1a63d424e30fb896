package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.NumFunctions

/** Classifier evaluation over a (label, prediction) table — the report
  * a pipeline reads before trusting a learned gate (q148's quality
  * classifier, q152's language ID): per-class support, prediction
  * count, true positives, precision, recall, F1. Classifier-agnostic —
  * any operator emitting `(label, pred)` rows plugs in.
  *
  * Scale design: rows collapse ONCE to confusion cells (one
  * partial-aggregating shuffle, ≤ K² rows for K classes); support,
  * prediction counts, and the diagonal all derive from the cell table
  * (metadata-scale aggregates + class-keyed joins AQE broadcasts).
  * Ratios are single IEEE divisions of exact counts, rounded at the
  * edge — replayable on any engine.
  */
object Eval {

  /** Per-class classification report:
    * `(class, support, predicted, tp, precision, recall, f1)`,
    * covering every class appearing as a label OR a prediction.
    * Precision/recall are 0 when their denominator is 0; F1 is 0 when
    * precision + recall is 0 (the sklearn zero-division=0 convention).
    */
  def classificationReport(df: DataFrame, labelCol: String,
                           predCol: String): DataFrame = {
    // cells feed THREE aggregations (support, predicted, diagonal) —
    // persist them or the full upstream prediction plan recomputes per
    // branch (measured 2.4× on q161). K²-bounded state; lazy-scoped
    // lifecycle (the result references the cache; ContextCleaner
    // reclaims it with the result).
    val cells = df
      .groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sup = cells.groupBy(col("label").as("class"))
      .agg(sum(col("n")).as("support"))
    val prd = cells.groupBy(col("pred").as("class"))
      .agg(sum(col("n")).as("predicted"))
    val tp = cells.filter(col("label") === col("pred"))
      .select(col("label").as("class"), col("n").as("tp"))
    val p = when(col("predicted") > 0,
      col("tp").cast("double") / col("predicted")).otherwise(lit(0.0))
    val r = when(col("support") > 0,
      col("tp").cast("double") / col("support")).otherwise(lit(0.0))
    sup.join(prd, Seq("class"), "full")
      .join(tp, Seq("class"), "left")
      .select(col("class"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("predicted"), lit(0L)).as("predicted"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision", NumFunctions.roundNz(p, 6))
      .withColumn("recall", NumFunctions.roundNz(r, 6))
      .withColumn("f1", NumFunctions.roundNz(
        when(p + r > 0, lit(2.0) * p * r / (p + r)).otherwise(lit(0.0)), 6))
  }

  /** Exact ROC-AUC (Mann-Whitney U form) and Brier score for a binary
    * classifier with FIXED-POINT probability units: one summary row
    * `(n_pos, n_neg, auc, brier)`. Tie handling is the exact midrank
    * convention, in INTEGERS: over distinct scores ascending,
    * `U·2 = Σ n_pos(s) · (2·cum_neg_below(s) + n_neg(s))`, so equal
    * scores contribute half a concordant pair each — no float rank, no
    * tie-break arbitrariness; AUC = U2 / (2·n_pos·n_neg) is a single
    * IEEE division (null when either class is absent). The Brier sum
    * folds over the same collapsed table
    * (`n_pos·(p−1)² + n_neg·p²` per distinct score) through
    * DECIMAL(28,9).
    *
    * Scale design: rows collapse ONCE to per-distinct-score counts
    * (one partial-aggregating shuffle); the cumulative window then
    * runs over a support BOUNDED BY CONSTRUCTION at `scaleUnits + 1`
    * distinct values — independent of the row count — which is why a
    * partition-less window is safe here (the documented bounded-window
    * convention; fixed-point scores exist precisely to bound this).
    * U2 products ride in DECIMAL(38,0), exact far beyond any long
    * overflow (2n² at n = 10¹¹ rows ≈ 2·10²² ≪ 10³⁸).
    */
  def binaryScoreEval(df: DataFrame, pUnitsCol: String, labelCol: String,
                      scaleUnits: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val y = col(labelCol).cast("long")
    val s = df.groupBy(col(pUnitsCol).as("__p"))
      .agg(sum(y).as("__np"), sum(lit(1L) - y).as("__nn"))
    val w = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pd = col("__p").cast("double") / scaleUnits.toDouble
    val t = s
      .withColumn("__cumn", sum(col("__nn")).over(w) - col("__nn"))
      .withColumn("__u2", col("__np").cast(DecimalType(38, 0)) *
        (lit(2L) * col("__cumn") + col("__nn")).cast(DecimalType(38, 0)))
      .withColumn("__bt",
        ((pd - lit(1.0)) * (pd - lit(1.0)) * col("__np") + pd * pd * col("__nn"))
          .cast(DecimalType(28, 9)))
    t.agg(sum(col("__np")).as("n_pos"), sum(col("__nn")).as("n_neg"),
        sum(col("__u2")).as("__u2s"), sum(col("__bt")).as("__bs"))
      .select(
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"),
        NumFunctions.roundNz(
          when(col("n_pos") > 0 && col("n_neg") > 0,
            col("__u2s").cast("double") /
              (lit(2.0) * col("n_pos") * col("n_neg")))
            .otherwise(lit(null)), 6).as("auc"),
        NumFunctions.roundNz(
          when(col("n_pos") + col("n_neg") > 0,
            col("__bs").cast("double") / (col("n_pos") + col("n_neg")))
            .otherwise(lit(null)), 6).as("brier"))
  }

  /** Uncertainty sampling (Lewis & Gale, SIGIR 1994): the `k` documents
    * whose predicted probability sits closest to the decision boundary
    * — the rows a labeling budget should be spent on (active learning's
    * classic query strategy; the companion pass after training q148's
    * filter). Margin is computed in exact fixed-point units
    * (`|p − scale/2|`), so the cut is a pure integer total order with
    * an id tie-break. Returns `(idCol, p_units, margin_units)` in
    * ascending-margin order.
    *
    * Scale shape: map-side margin projection + a global TakeOrdered
    * k-row cut (per-partition heaps, no global sort materialization).
    */
  def uncertaintyTopK(df: DataFrame, idCol: String, pUnitsCol: String,
                      k: Int, scaleUnits: Long = 1000000L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(scaleUnits % 2 == 0, s"scaleUnits must be even, got $scaleUnits")
    df.select(col(idCol), col(pUnitsCol).as("p_units"),
        abs(col(pUnitsCol) - lit(scaleUnits / 2)).as("margin_units"))
      .orderBy(col("margin_units").asc, col(idCol).asc)
      .limit(k)
  }

  /** Calibration (reliability) table for a probabilistic classifier
    * whose scores are FIXED-POINT units (`scaleUnits` = probability
    * 1.0, the [[QualityClassifier.Scale]] convention): equal-width
    * probability buckets, and per bucket the document count, mean
    * predicted probability, and observed positive rate — a
    * well-calibrated model has mean_p ≈ pos_rate per bucket (the
    * reliability-diagram table; Niculescu-Mizil & Caruana 2005). The
    * bucket cut is INTEGER division of exact units, so bucketing can
    * never disagree across engines at a boundary.
    *
    * Scale shape: one map-side bucket projection + one
    * partial-aggregating shuffle over ≤ `buckets` groups.
    */
  def calibrationBuckets(df: DataFrame, pUnitsCol: String, labelCol: String,
                         buckets: Int = 10,
                         scaleUnits: Long = 1000000L): DataFrame = {
    require(buckets > 0 && scaleUnits % buckets == 0,
      s"buckets must divide scaleUnits evenly, got $buckets / $scaleUnits")
    val width = scaleUnits / buckets
    df
      .withColumn("bucket",
        least(lit(buckets - 1L), expr(s"$pUnitsCol div $width")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(pUnitsCol)).as("__sp"),
        sum(col(labelCol).cast("long")).as("__sy"))
      .select(col("bucket"), col("n_docs"),
        NumFunctions.roundNz(
          col("__sp").cast("double") / col("n_docs") / scaleUnits.toDouble, 6)
          .as("mean_p"),
        NumFunctions.roundNz(
          col("__sy").cast("double") / col("n_docs"), 6).as("pos_rate"))
  }

  /** Deterministic BOOTSTRAP confidence band for a corpus-mean metric
    * (Efron's nonparametric bootstrap, percentile method): `numResamples`
    * with-replacement resamples of the full corpus, each resample's
    * mean of the integer `metricCol`, then exact order-statistic
    * percentiles across the resample means — the uncertainty a
    * datasheet should attach to any "mean tokens per doc"-style claim
    * before two corpus versions are compared on it.
    *
    * Randomness is md5-keyed on `(salt, resample, draw)` — the q63/
    * q207 hash discipline — so the band is a pure function of the
    * corpus: reproducible across runs, engines, and partitionings.
    * Draw `i` of resample `b` picks the document at 1-based position
    * `(md5 first-8-hex mod n) + 1` in the `idCol` order (position via
    * the two-level [[Ranks.globalRank]] — no global window over doc
    * rows). The metric must be integer-valued: each resample's sum is
    * then EXACT, its mean one IEEE division rounded to 6, and the
    * percentile an exact order statistic over `numResamples` means.
    *
    * Scale shape: the draw grid is `numResamples × n` rows — one
    * md5 projection, one equi-join against the position-keyed corpus,
    * one partial-aggregating collapse to `numResamples` rows; the
    * percentile windows run over those `numResamples` metadata rows
    * only. Cost is `numResamples` corpus passes' worth of JOIN rows,
    * the honest price of an EXACT multinomial bootstrap; for large
    * corpora prefer [[bootstrapMeanCIPooled]], the one-corpus-pass
    * Poisson twin with no grid join at all.
    *
    * Returns one row per requested percentile:
    * `(q_pct, n_docs, n_resamples, boot_mean)`.
    */
  def bootstrapMeanCI(df: DataFrame, idCol: String, metricCol: String,
                      numResamples: Int = 200, qPcts: Seq[Int] = Seq(5, 50, 95),
                      salt: String = "bs"): DataFrame = {
    require(numResamples >= 1 && numResamples <= 10000,
      s"numResamples must be in [1, 10000], got $numResamples")
    require(qPcts.nonEmpty && qPcts.forall(q => q >= 1 && q <= 100),
      s"percentiles must be in [1, 100], got $qPcts")
    val spark = df.sparkSession
    import spark.implicits._

    val base = df.select(col(idCol).as("__id"),
      col(metricCol).cast("long").as("__v"))
    val n = base.count()
    require(n >= 1, "bootstrap needs a non-empty corpus")
    val ranked = Ranks.globalRank(base, Seq(col("__id")), outCol = "__idx")

    // grid = range(n) × broadcast(range(numResamples)): streams the
    // numResamples × n draw rows without ever materializing an
    // n-element array per resample row (sequence+explode allocates 8n
    // bytes per row before exploding — an OOM at corpus n, and an
    // outright error past 2^31 elements)
    val grid = spark.range(1, n + 1).toDF("__i")
      .crossJoin(broadcast(spark.range(1, numResamples + 1L).toDF("__b")))
      .select(col("__b"), (pmod(conv(substring(md5(concat_ws(":",
        lit(salt), col("__b").cast("string"), col("__i").cast("string"))),
        1, 8), 16, 10).cast("long"), lit(n)) + 1L).as("__idx"))
    val means = grid
      .join(ranked.select(col("__idx"), col("__v")), "__idx")
      .groupBy(col("__b"))
      .agg(NumFunctions.roundNz(
        sum(col("__v")).cast("double") / lit(n.toDouble), 6).as("__m"))

    // exact order-statistic percentiles over numResamples means —
    // metadata-scale windows (<= numResamples rows)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("__m"))
    val cum = means.groupBy(col("__m")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.join(broadcast(qPcts.map(_.toLong).toDF("q_pct")),
        col("__cum") * 100 >= lit(numResamples.toLong) * col("q_pct"))
      .groupBy(col("q_pct"))
      .agg(min(col("__m")).as("boot_mean"))
      .select(col("q_pct"), lit(n).as("n_docs"),
        lit(numResamples.toLong).as("n_resamples"), col("boot_mean"))
  }

  /** McNemar's paired gate for FILTER A/B promotion (McNemar 1947;
    * the correct test when two filter versions run on the SAME corpus
    * — a two-proportion z assumes independent samples and overstates
    * significance on paired data): per group, count the concordant
    * and DISCORDANT documents (passed A but not B, and vice versa);
    * the statistic `z = (n_ab − n_ba) / sqrt(n_ab + n_ba)` asks
    * whether the version change moved the pass set beyond chance.
    * This is the number a data lead reads before promoting quality
    * filter v2: "it passes 2 % more" means nothing if the discordant
    * counts are 30 vs 28 on a million docs.
    *
    * Determinism: counts are exact; `sqrt` is IEEE-754
    * correctly-rounded in every engine, so one divide + round(6) is
    * replayable bit-for-bit; `significant` compares the ROUNDED z
    * against the 1.96 two-sided 95 % literal (both engines compare
    * identical doubles). Groups with zero discordant docs report
    * z = 0, not NaN (the versions agree everywhere — nothing to
    * promote or block).
    *
    * Scale shape: ONE partial-aggregating collapse to a row per group
    * — both pass flags evaluate row-local in the scan projection;
    * nothing joins, nothing windows.
    *
    * Returns `(group, n_docs, a_pass, b_pass, n_ab, n_ba, z_r,
    * significant)`.
    */
  def mcnemarGate(df: DataFrame, groupCol: String, passA: Column,
                  passB: Column): DataFrame = {
    val a = passA.cast("boolean")
    val b = passB.cast("boolean")
    df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(a, 1L).otherwise(0L)).as("a_pass"),
        sum(when(b, 1L).otherwise(0L)).as("b_pass"),
        sum(when(a && !b, 1L).otherwise(0L)).as("n_ab"),
        sum(when(!a && b, 1L).otherwise(0L)).as("n_ba"))
      .withColumn("z_r", when(col("n_ab") + col("n_ba") === 0, lit(0.0))
        .otherwise(NumFunctions.roundNz(
          (col("n_ab") - col("n_ba")).cast("double") /
            sqrt((col("n_ab") + col("n_ba")).cast("double")), 6)))
      .withColumn("significant", abs(col("z_r")) > 1.96)
  }

  /** Poisson(1) cumulative thresholds on the integer grid [0, 1e6):
    * a draw `u` (uniform from md5) maps to weight
    * `w = |{t ∈ table : t ≤ u}|` — the inverse-CDF lookup, truncated
    * at w = 9 (tail mass < 1e-6). Integer thresholds make the lookup
    * EXACT and engine-portable: both sides compare the same integers,
    * no floating-point CDF to diverge on.
    */
  private val poissonThresholds: Seq[Long] = Seq(
    367879L, 735759L, 919699L, 981012L, 996340L,
    999406L, 999917L, 999990L, 999999L)

  /** ONE-PASS Poisson bootstrap confidence band — the at-scale twin of
    * [[bootstrapMeanCI]] (Chamandy et al., "Estimating uncertainty for
    * massive data streams", Google TR 2012; Kleiner et al.'s scalable
    * bootstrap line): instead of materializing a `numResamples × n`
    * draw grid and joining it back to the corpus, each document draws
    * an independent Poisson(1) weight PER RESAMPLE — the classic
    * approximation of the multinomial resample for large n — and every
    * resample's weighted sum folds MAP-SIDE in a single corpus pass:
    * explode to `(doc, resample)` inside the scan partition, hash-agg
    * partials collapse to ≤ `numResamples` rows per partition before
    * the only (metadata-scale) shuffle. No grid, no join, no rank.
    *
    * Determinism: the weight for `(resample b, doc id)` is the
    * inverse-CDF lookup of `md5(salt:b:id) mod 1e6` against the
    * integer [[poissonThresholds]] table — a pure function of the
    * corpus (q63/q207 hash discipline), bit-replayable in any engine
    * that has md5. Resample means are `Σ w·v / Σ w` (the Poisson
    * bootstrap normalizes by the REALIZED weight, which concentrates
    * at n); resamples whose total weight is zero are dropped (mean
    * undefined; probability ≈ e^{-n}), and `n_resamples` reports the
    * retained count so the percentile denominator is honest.
    *
    * Returns one row per requested percentile:
    * `(q_pct, n_docs, n_resamples, boot_mean)`; empty corpus → empty
    * frame (the grid twin raises instead — it must count first, this
    * one never does).
    */
  def bootstrapMeanCIPooled(df: DataFrame, idCol: String, metricCol: String,
                            numResamples: Int = 200,
                            qPcts: Seq[Int] = Seq(5, 50, 95),
                            salt: String = "bsp"): DataFrame = {
    require(numResamples >= 1 && numResamples <= 10000,
      s"numResamples must be in [1, 10000], got $numResamples")
    require(qPcts.nonEmpty && qPcts.forall(q => q >= 1 && q <= 100),
      s"percentiles must be in [1, 100], got $qPcts")
    val spark = df.sparkSession
    import spark.implicits._

    val drawn = df
      .select(col(idCol).cast("string").as("__id"),
        col(metricCol).cast("long").as("__v"))
      .select(col("__id"), col("__v"),
        explode(sequence(lit(1), lit(numResamples))).as("__b"))
      .withColumn("__u", pmod(conv(substring(md5(concat_ws(":",
        lit(salt), col("__b").cast("string"), col("__id"))),
        1, 8), 16, 10).cast("long"), lit(1000000L)))
      // inverse-CDF lookup as a summed comparison chain, NOT an array
      // HOF: higher-order functions are interpreted (no codegen) and
      // would break the whole explode→weight→partial-agg stage out of
      // WholeStageCodegen — measured 4× slower on the hot path
      .withColumn("__w", poissonThresholds
        .map(t => when(col("__u") >= t, 1L).otherwise(0L))
        .reduce(_ + _))
    val means = drawn.groupBy(col("__b"))
      .agg(count(lit(1)).as("__nd"), sum(col("__w")).as("__c"),
        sum(col("__w") * col("__v")).as("__s"))
      .filter(col("__c") > 0)
      .select(col("__nd"), NumFunctions.roundNz(
        col("__s").cast("double") / col("__c").cast("double"), 6).as("__m"))

    // exact order-statistic percentiles over the retained resample
    // means — metadata-scale windows (≤ numResamples rows); the
    // retained total rides an unbounded window so no driver action
    // ever touches the frame
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.orderBy(col("__m"))
    val cum = means.groupBy(col("__m"))
      .agg(count(lit(1)).as("__c"), max(col("__nd")).as("__nd"))
      .withColumn("__cum", sum(col("__c")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("__c")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__n", max(col("__nd")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    cum.join(broadcast(qPcts.map(_.toLong).toDF("q_pct")),
        col("__cum") * 100 >= col("__tot") * col("q_pct"))
      .groupBy(col("q_pct"))
      .agg(max(col("__n")).as("n_docs"), max(col("__tot")).as("n_resamples"),
        min(col("__m")).as("boot_mean"))
      .select(col("q_pct"), col("n_docs"), col("n_resamples"),
        col("boot_mean"))
  }
}
