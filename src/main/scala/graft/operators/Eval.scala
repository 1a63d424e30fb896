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
    *
    * CLUSTER bootstrap for free: because the weight keys on
    * `(resample, idCol)`, passing a GROUP id (the source, the domain)
    * as `idCol` makes every document of that group draw the SAME
    * weight per resample — whole clusters resample together (Field &
    * Welsh, JRSS-B 2007), the correct uncertainty when documents
    * within a source correlate and the iid bootstrap would understate
    * the band (q236 runs exactly this, keyed on `source`, and its
    * band is wider than q212's iid band on the same metric —
    * oracle-checked).
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

  /** Fleiss' kappa inter-annotator agreement per group (Fleiss,
    * Psychological Bulletin 1971): the chance-corrected agreement of a
    * FIXED panel of `ratersPerItem` raters labeling the same items —
    * the number a labeling program reads before trusting its rubric
    * ("raters agree 85 %" means nothing when two labels cover 90 % of
    * the data; kappa subtracts the agreement chance alone would buy).
    * Cohen's kappa is the 2-rater special case; Fleiss is the panel
    * generalization an annotation pipeline actually runs.
    *
    * Exactness: every term of the textbook formula is a RATIO OF
    * INTEGERS — per-item category counts `n_ij`, their squares, and
    * category totals. Clearing denominators gives
    * `kappa = [(S2 − Nn)·Nn − Cs·(n−1)] / [((Nn)² − Cs)·(n−1)]`
    * with `S2 = Σ_i Σ_j n_ij²`, `Cs = Σ_j c_j²`, `N` items, `n`
    * raters: ONE division of two exact DECIMAL(38,0) integers, rounded
    * at the edge — bit-replayable in any engine with 128-bit integer
    * arithmetic. A zero denominator means every rating landed in one
    * category (P̄e = 1 forces P̄ = 1): reported as kappa 1.0, perfect
    * if vacuous agreement. Items whose ratings don't come from exactly
    * `ratersPerItem` DISTINCT raters — too few, too many, or a
    * duplicated rating from one rater (a replayed event masquerading
    * as a panel) — are EXCLUDED (Fleiss requires a constant panel) and
    * surfaced in `n_dropped`; a group with no complete items reports
    * null kappa.
    *
    * Scale shape: ratings collapse ONCE to (group, item, label) cells
    * (partial-aggregating shuffle); item and category marginals are
    * two key-local regroups of the cell table; the kappa arithmetic
    * runs on one row per group. The cell table is persisted because it
    * feeds both marginals (the [[classificationReport]] lazy-scoped
    * lifecycle). No window, no join wider than group grain.
    *
    * Returns `(grp, n_items, n_dropped, n_categories, kappa_r)`.
    */
  def fleissKappa(ratings: DataFrame, groupCol: String, itemCol: String,
                  raterCol: String, labelCol: String,
                  ratersPerItem: Int): DataFrame = {
    require(ratersPerItem >= 2,
      s"Fleiss' kappa needs at least 2 raters per item, got $ratersPerItem")
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val cells = ratings
      .groupBy(col(groupCol).as("grp"), col(itemCol).as("__item"),
        col(labelCol).as("__lab"))
      .agg(count(lit(1)).as("__nij"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // panel validity needs RATER IDENTITY, not just the rating count —
    // a duplicated rating from one rater plus a missing rater would
    // otherwise masquerade as a complete panel. Distinct raters per
    // item via two-level aggregation (the kAnonymityAudit no-Expand
    // discipline); complete ⟺ ratings = distinct raters = panel size.
    val raters = ratings
      .select(col(groupCol).as("grp"), col(itemCol).as("__item"),
        col(raterCol).as("__rater")).distinct()
      .groupBy(col("grp"), col("__item"))
      .agg(count(lit(1)).as("__nr"))
    val items = cells.groupBy(col("grp"), col("__item"))
      .agg(sum(col("__nij")).as("__ni"),
        sum(col("__nij") * col("__nij")).as("__s2i"))
      .join(raters, Seq("grp", "__item"))
    val ok = col("__ni") === ratersPerItem && col("__nr") === ratersPerItem
    val perGroup = items.groupBy(col("grp")).agg(
      sum(when(ok, 1L).otherwise(0L)).as("n_items"),
      sum(when(!ok, 1L).otherwise(0L)).as("n_dropped"),
      sum(when(ok, col("__s2i")).otherwise(lit(0L))).as("__S2"))
    // category totals over COMPLETE items only — the same cells joined
    // back to the item grain they came from (key-local equi-join)
    val catTotals = cells
      .join(items.filter(ok).select(col("grp"), col("__item")),
        Seq("grp", "__item"))
      .groupBy(col("grp"), col("__lab"))
      .agg(sum(col("__nij")).as("__cj"))
    val perGroupCats = catTotals.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("__cj").cast(d38) * col("__cj").cast(d38)).as("__Cs"))
    val nn = (col("n_items") * ratersPerItem).cast(d38)
    val s2 = col("__S2").cast(d38)
    val cs = coalesce(col("__Cs"), lit(0).cast(d38))
    val num = (s2 - nn) * nn - cs * (ratersPerItem - 1)
    val den = (nn * nn - cs) * (ratersPerItem - 1)
    perGroup.join(perGroupCats, Seq("grp"), "left")
      .select(col("grp"), col("n_items"), col("n_dropped"),
        coalesce(col("n_categories"), lit(0L)).as("n_categories"),
        when(col("n_items") === 0, lit(null).cast("double"))
          .when(den === 0, lit(1.0))
          .otherwise(NumFunctions.roundNz(
            num.cast("double") / den.cast("double"), 6)).as("kappa_r"))
  }

  /** Krippendorff's alpha for NOMINAL data per group (Krippendorff
    * 2011, "Computing Krippendorff's alpha-reliability"): the
    * agreement coefficient for the panels [[fleissKappa]] must drop —
    * real annotation tables have items rated by 2 raters here and 3
    * there, and alpha's disagreement form handles exactly that:
    * `alpha = 1 − (n−1)·D_num/D_den` with
    * `D_num = Σ_items Σ_c n_ic(n_i − n_ic)/(n_i − 1)`,
    * `D_den = Σ_c n_c(n − n_c)`, over the PAIRABLE ratings (items with
    * at least 2 ratings; `n` their total).
    *
    * Exactness: the only fractions are the per-item `1/(n_i − 1)`
    * factors, and panels are BOUNDED (`n_i ≤ maxRaters` by contract),
    * so scaling by `L = lcm(1 … maxRaters−1)` clears every
    * denominator: `alpha = (L·D_den − (n−1)·D_numL) / (L·D_den)` is
    * ONE division of two exact DECIMAL(38,0) integers, rounded at the
    * edge. All ratings in one category → D_den = 0 → alpha 1.0
    * (vacuously perfect); no pairable items → null. Excluded items are
    * SURFACED, not silently capped: `n_single` (one rating — nothing
    * to pair) and `n_oversize` (panel above `maxRaters` — raise the
    * bound rather than trust a silent drop).
    *
    * Scale shape: the [[fleissKappa]] skeleton — one collapse to
    * (group, item, label) cells, item marginals, a key-local join
    * restricting cells to pairable items, and group-grain arithmetic.
    * No window.
    *
    * Returns `(grp, n_items, n_single, n_oversize, n_ratings,
    * alpha_r)`.
    */
  def krippendorffAlpha(ratings: DataFrame, groupCol: String,
                        itemCol: String, labelCol: String,
                        maxRaters: Int = 12): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 24,
      s"maxRaters must be in [2, 24], got $maxRaters")
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val L = (1 until maxRaters).map(BigInt(_))
      .foldLeft(BigInt(1))((a, b) => a * b / a.gcd(b)).toLong
    val cells = ratings
      .groupBy(col(groupCol).as("grp"), col(itemCol).as("__item"),
        col(labelCol).as("__lab"))
      .agg(count(lit(1)).as("__nij"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val items = cells.groupBy(col("grp"), col("__item"))
      .agg(sum(col("__nij")).as("__ni"))
    val pairable = items
      .filter(col("__ni") >= 2 && col("__ni") <= maxRaters)
    val joined = cells.join(pairable, Seq("grp", "__item"))
    // D_numL = Σ n_ij(n_i − n_ij)·(L/(n_i−1)) — the divisor is exact
    // because L is divisible by every possible n_i − 1
    val numL = joined.groupBy(col("grp"))
      .agg(sum(col("__nij").cast(d38) * (col("__ni") - col("__nij"))
        .cast(d38) * (lit(L) / (col("__ni") - 1)).cast(d38)).as("__numL"))
    val cat = joined.groupBy(col("grp"), col("__lab"))
      .agg(sum(col("__nij")).as("__nc"))
    val nTot = pairable.groupBy(col("grp"))
      .agg(sum(col("__ni")).as("n_ratings"))
    val dden = cat.join(nTot, "grp")
      .groupBy(col("grp"))
      .agg(max(col("n_ratings")).as("n_ratings"),
        sum(col("__nc").cast(d38) *
          (col("n_ratings") - col("__nc")).cast(d38)).as("__dden"))
    val counts = items.groupBy(col("grp")).agg(
      sum(when(col("__ni") >= 2 && col("__ni") <= maxRaters, 1L)
        .otherwise(0L)).as("n_items"),
      sum(when(col("__ni") === 1, 1L).otherwise(0L)).as("n_single"),
      sum(when(col("__ni") > maxRaters, 1L).otherwise(0L)).as("n_oversize"))
    val lDden = lit(L).cast(d38) * col("__dden")
    val alpha = when(col("n_items") === 0, lit(null).cast("double"))
      .when(lDden === 0, lit(1.0))
      .otherwise(NumFunctions.roundNz(
        (lDden - (col("n_ratings") - 1).cast(d38) * col("__numL"))
          .cast("double") / lDden.cast("double"), 6))
    counts
      .join(numL.join(dden, "grp"), Seq("grp"), "left")
      .select(col("grp"), col("n_items"), col("n_single"),
        col("n_oversize"),
        coalesce(col("n_ratings"), lit(0L)).as("n_ratings"),
        alpha.as("alpha_r"))
  }

  /** Paired sign-flip PERMUTATION test per group (Fisher's exact
    * randomization logic; the add-one p estimator of Phipson & Smyth
    * 2010): for two scorers run on the SAME documents, is the observed
    * total score difference larger than chance relabeling explains?
    * Under the null the two scores are exchangeable within each pair,
    * so each document's difference `d = a − b` keeps or flips its sign
    * with equal probability; the p-value is the fraction of
    * `numPerms` sign assignments whose |Σ ± d| reaches the observed
    * |Σ d|. The distribution-free companion of [[mcnemarGate]] — that
    * gate tests paired PASS FLAGS, this one paired integer SCORES,
    * with no normality assumption at all.
    *
    * Determinism: the sign for `(perm p, doc id)` is the low bit of
    * `md5(salt:p:id)` (the q63/q207/q212 hash discipline) — the test
    * is a pure function of the corpus, replayable in any engine with
    * md5. Scores must be integer-valued: every permuted total is an
    * EXACT long, the comparison `|T_p| ≥ |T_obs|` is integer-exact,
    * and the only float is the final add-one ratio
    * `(n_ge + 1)/(numPerms + 1)`, rounded at the edge.
    *
    * Scale shape: the [[bootstrapMeanCIPooled]] one-pass skeleton —
    * differences explode to `(doc, perm)` INSIDE the scan partition
    * and hash-agg partials collapse to ≤ numPerms rows per group
    * before the only shuffle; the observed totals join back at group
    * grain. No draw grid, no window over data rows.
    *
    * Returns `(grp, n_docs, t_obs, n_ge, p_r)`.
    */
  def pairedPermutationTest(df: DataFrame, groupCol: String, idCol: String,
                            scoreA: Column, scoreB: Column,
                            numPerms: Int = 200,
                            salt: String = "pt"): DataFrame = {
    require(numPerms >= 1 && numPerms <= 10000,
      s"numPerms must be in [1, 10000], got $numPerms")
    // the projected differences feed BOTH the observed totals and the
    // permutation fold — persist them or the upstream (often a
    // tokenizing projection) recomputes per branch. UNLIKE
    // classificationReport's K²-bounded state this cache is
    // CORPUS-SCALE (one row per doc) and is reclaimed only when the
    // ContextCleaner collects the returned frame — callers issuing
    // many statistics calls in one session should materialize each
    // result promptly so the cache can drop (the returned plan must
    // stay live for the PlanSpec window gates, so the operator cannot
    // eagerly localize it here)
    val base = df.select(col(groupCol).as("grp"),
      col(idCol).cast("string").as("__id"),
      (scoreA.cast("long") - scoreB.cast("long")).as("__d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val obs = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__d")).as("t_obs"))
    val totals = base
      .select(col("grp"), col("__id"), col("__d"),
        explode(sequence(lit(1), lit(numPerms))).as("__p"))
      .withColumn("__s", lit(2L) * pmod(conv(substring(md5(concat_ws(":",
        lit(salt), col("__p").cast("string"), col("__id"))),
        1, 8), 16, 10).cast("long"), lit(2L)) - 1L)
      .groupBy(col("grp"), col("__p"))
      .agg(sum(col("__s") * col("__d")).as("__t"))
    totals.join(obs, "grp")
      .groupBy(col("grp"))
      .agg(max(col("n_docs")).as("n_docs"), max(col("t_obs")).as("t_obs"),
        sum(when(abs(col("__t")) >= abs(col("t_obs")), 1L).otherwise(0L))
          .as("n_ge"))
      .withColumn("p_r", NumFunctions.roundNz(
        (col("n_ge") + 1).cast("double") / lit((numPerms + 1).toDouble), 6))
  }

  /** Cochran's Q test for k PAIRED filter versions (Cochran,
    * Biometrika 1950): the k-treatment generalization of
    * [[mcnemarGate]] — when THREE OR MORE gate versions run on the
    * same corpus, pairwise McNemars inflate the false-alarm rate; Q
    * asks once whether ANY version's pass rate differs, per group.
    * In the cleared-denominator integer form
    * `Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²)` with `C_j` the
    * per-version pass totals, `R_i` each document's pass count, and
    * `N = ΣC_j`: every term is an exact integer (DECIMAL(38,0) for the
    * squares), the statistic is ONE division rounded at the edge, and
    * at k = 2 it reduces algebraically to McNemar's z². `significant`
    * compares the ROUNDED Q against the caller's chi-square critical
    * value (df = k−1; the default 5.991464 is χ²₀.₀₅ at df 2 for the
    * three-version case). A zero denominator means every document
    * passed all or none of the versions — nothing to test, Q = 0.
    *
    * Scale shape: all flags and the per-document pass count evaluate
    * row-local in the scan projection; ONE partial-aggregating
    * collapse to a row per group. No join, no window — the
    * [[mcnemarGate]] shape at any k.
    *
    * Returns `(grp, n_docs, c0…c{k−1}, q_r, significant)`.
    */
  def cochranQ(df: DataFrame, groupCol: String, passCols: Seq[Column],
               critQ: Double = 5.991464): DataFrame = {
    require(passCols.size >= 2 && passCols.size <= 8,
      s"need 2..8 paired versions, got ${passCols.size}")
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val k = passCols.size
    val flags = passCols.zipWithIndex.map { case (c, j) =>
      when(c.cast("boolean"), 1L).otherwise(0L).as(s"__f$j")
    }
    val r = (0 until k).map(j => col(s"__f$j")).reduce(_ + _)
    val cSums = (0 until k).map(j => sum(col(s"__f$j")).as(s"c$j"))
    val base = df.select(col(groupCol).as("grp") +: flags: _*)
      .withColumn("__r", r)
    val g = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        (cSums :+ sum(col("__r") * col("__r")).as("__sr2")): _*)
    val n = (0 until k).map(j => col(s"c$j")).reduce(_ + _).cast(d38)
    val sumC2 = (0 until k).map(j => col(s"c$j").cast(d38) *
      col(s"c$j").cast(d38)).reduce(_ + _)
    val num = lit(k - 1).cast(d38) * (lit(k).cast(d38) * sumC2 - n * n)
    val den = lit(k).cast(d38) * n - col("__sr2").cast(d38)
    g.withColumn("q_r", when(den === 0, lit(0.0))
        .otherwise(NumFunctions.roundNz(
          num.cast("double") / den.cast("double"), 6)))
      .withColumn("significant", col("q_r") > critQ)
      .drop("__sr2")
  }

  /** Cohen's d standardized effect size per group (Cohen 1988): HOW
    * LARGE is the difference between two document slices on an
    * integer metric, in pooled-standard-deviation units — the number
    * read NEXT TO a significance test ([[pairedPermutationTest]],
    * [[mcnemarGate]]): on a hundred-million-doc corpus everything is
    * "significant"; d says whether anyone should care (0.2 small /
    * 0.5 medium / 0.8 large, Cohen's own benchmarks).
    *
    * Exactness: per slice, `n`, `Σx`, `Σx²` are exact DECIMAL(38,0)
    * sums; `n·Σx² − (Σx)²` (= n times the centered sum of squares) is
    * an exact integer, so means, the pooled variance
    * `(ss_a + ss_b)/(n_a + n_b − 2)`, and d itself are a FIXED chain
    * of IEEE divisions and one correctly-rounded sqrt — replayable
    * operation-for-operation in any engine. Slices with fewer than 2
    * rows, or zero pooled variance, report null d (undefined, not 0).
    *
    * Scale shape: the slice flag evaluates row-local; ONE
    * partial-aggregating collapse to a row per group. No join, no
    * window.
    *
    * Returns `(grp, n_a, n_b, mean_diff_r, d_r)`.
    */
  def cohensD(df: DataFrame, groupCol: String, metricCol: String,
              isA: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val a = isA.cast("boolean")
    val x = col(metricCol).cast("long")
    // null metrics carry no position: drop them, or they would count
    // in a slice's n while contributing nothing to its sums
    val g = df.filter(col(metricCol).isNotNull)
      .select(col(groupCol).as("grp"), x.as("__x"),
        when(a, 1L).otherwise(0L).as("__a"))
      .groupBy(col("grp"))
      .agg(sum(col("__a")).as("n_a"),
        sum(lit(1L) - col("__a")).as("n_b"),
        sum(when(col("__a") === 1, col("__x").cast(d38))
          .otherwise(lit(0).cast(d38))).as("__sa"),
        sum(when(col("__a") === 0, col("__x").cast(d38))
          .otherwise(lit(0).cast(d38))).as("__sb"),
        sum(when(col("__a") === 1, col("__x").cast(d38) *
          col("__x").cast(d38)).otherwise(lit(0).cast(d38))).as("__qa"),
        sum(when(col("__a") === 0, col("__x").cast(d38) *
          col("__x").cast(d38)).otherwise(lit(0).cast(d38))).as("__qb"))
    val ma = col("__sa").cast("double") / col("n_a").cast("double")
    val mb = col("__sb").cast("double") / col("n_b").cast("double")
    val va = col("n_a").cast(d38) * col("__qa") - col("__sa") * col("__sa")
    val vb = col("n_b").cast(d38) * col("__qb") - col("__sb") * col("__sb")
    val ssa = va.cast("double") / col("n_a").cast("double")
    val ssb = vb.cast("double") / col("n_b").cast("double")
    val pooled = (ssa + ssb) / (col("n_a") + col("n_b") - 2).cast("double")
    g.select(col("grp"), col("n_a"), col("n_b"),
      when(col("n_a") === 0 || col("n_b") === 0, lit(null).cast("double"))
        .otherwise(NumFunctions.roundNz(ma - mb, 6)).as("mean_diff_r"),
      when(col("n_a") < 2 || col("n_b") < 2, lit(null).cast("double"))
        .when(ssa + ssb === 0.0, lit(null).cast("double"))
        .otherwise(NumFunctions.roundNz((ma - mb) / sqrt(pooled), 6))
        .as("d_r"))
  }

  /** Cliff's delta ordinal effect size per group (Cliff, Psychological
    * Bulletin 1993): `P(x > y) − P(x < y)` over all cross-slice pairs
    * — the DISTRIBUTION-FREE companion of [[cohensD]] (d assumes the
    * metric's spread is meaningfully summarized by a variance; delta
    * only uses order, so a heavy-tailed length distribution can't lie
    * through it). Ties count for neither side, the standard
    * convention; delta = 2·AUC − 1 against [[binaryScoreEval]]'s
    * Mann-Whitney form.
    *
    * Exactness: rows collapse to per-(group, value) slice counts; the
    * greater/less pair counts are exact integer products of those
    * counts with a cumulative window, and delta is ONE division by
    * `n_a·n_b`, rounded at the edge. Pair counts are emitted as longs
    * — exact while `n_a·n_b < 2⁶³`, i.e. either slice under ~3·10⁹
    * rows per group, the documented bound.
    *
    * Scale shape: one partial-aggregating collapse to (group, value)
    * counts; the cumulative window partitions BY GROUP and runs over
    * each group's DISTINCT metric values — bounded by the value
    * support, never the row count (the [[binaryScoreEval]] fixed-point
    * convention: integer metrics exist precisely to bound this).
    *
    * Returns `(grp, n_a, n_b, gt, lt, delta_r)`.
    */
  def cliffsDelta(df: DataFrame, groupCol: String, metricCol: String,
                  isA: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val a = isA.cast("boolean")
    // null metrics have no rank position: drop them (ASC windows sort
    // nulls FIRST, so a kept null row would inflate every cumulative-
    // below count as if null were the smallest value)
    val c = df.filter(col(metricCol).isNotNull)
      .select(col(groupCol).as("grp"), col(metricCol).cast("long").as("__v"),
        when(a, 1L).otherwise(0L).as("__a"))
      .groupBy(col("grp"), col("__v"))
      .agg(sum(col("__a")).as("__ca"), sum(lit(1L) - col("__a")).as("__cb"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val g = c
      .withColumn("__below", sum(col("__cb")).over(wCum) - col("__cb"))
      .withColumn("__totb", sum(col("__cb")).over(wAll))
      .groupBy(col("grp"))
      .agg(sum(col("__ca")).as("n_a"), max(col("__totb")).as("n_b"),
        sum(col("__ca").cast(d38) * col("__below").cast(d38)).as("__gt"),
        sum(col("__ca").cast(d38) * (col("__totb") - col("__below") -
          col("__cb")).cast(d38)).as("__lt"))
    g.select(col("grp"), col("n_a"), col("n_b"),
      col("__gt").cast("long").as("gt"), col("__lt").cast("long").as("lt"),
      when(col("n_a") === 0 || col("n_b") === 0, lit(null).cast("double"))
        .otherwise(NumFunctions.roundNz(
          (col("__gt") - col("__lt")).cast("double") /
            (col("n_a").cast(d38) * col("n_b").cast(d38)).cast("double"), 6))
        .as("delta_r"))
  }

  /** Wilcoxon signed-rank test per group (Wilcoxon, Biometrics 1945;
    * normal approximation with the standard tie correction): the
    * magnitude-aware PAIRED test between [[pairedPermutationTest]]
    * (signs only, exact but resampled) and a t-test (assumes
    * normality): rank the nonzero |differences|, sum the ranks of the
    * positive ones, and ask how far that sum sits from its null mean.
    * Zero differences drop (the standard convention); ties share
    * MIDRANKS.
    *
    * Exactness: midranks are half-integers, so everything carries in
    * DOUBLED units — `rank2 = 2·cum_before + t + 1` is an exact
    * integer per tie group, `W2 = Σ ca·rank2` an exact DECIMAL(38,0),
    * and the tie-corrected z clears every fraction:
    * `z = (2·W2 − n(n+1)) / sqrt((2·n(n+1)(2n+1) − Σ(t³−t))/3)` —
    * integer numerator, one divide + one IEEE sqrt on an exact
    * integer, rounded at the edge. The variance term is strictly
    * positive for n ≥ 1, so no zero-denominator case exists; groups
    * whose differences are ALL zero have nothing to rank and drop
    * from the output (documented).
    *
    * Scale shape: one collapse to (group, |d|) tie groups; the rank
    * window partitions BY GROUP over distinct |d| values — the
    * bounded-value-support convention ([[cliffsDelta]]); one final
    * group collapse. No join.
    *
    * Returns `(grp, n_nz, w2, z_r, significant)` — `w2` is the
    * doubled positive-rank sum, `significant` the 1.96 two-sided gate
    * on the rounded z.
    */
  def wilcoxonSignedRank(df: DataFrame, groupCol: String, scoreA: Column,
                         scoreB: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val d = (scoreA.cast("long") - scoreB.cast("long"))
    val nz = df.select(col(groupCol).as("grp"), d.as("__d"))
      .filter(col("__d") =!= 0)
      .select(col("grp"), abs(col("__d")).as("__ad"),
        when(col("__d") > 0, 1L).otherwise(0L).as("__pos"))
    val c = nz.groupBy(col("grp"), col("__ad"))
      .agg(count(lit(1)).as("__t"), sum(col("__pos")).as("__ca"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("__ad"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = c
      .withColumn("__cb", sum(col("__t")).over(wCum) - col("__t"))
      .groupBy(col("grp"))
      .agg(sum(col("__t")).as("n_nz"),
        sum(col("__ca").cast(d38) *
          (lit(2L) * col("__cb") + col("__t") + 1).cast(d38)).as("__w2"),
        sum(col("__t").cast(d38) * col("__t").cast(d38) * col("__t").cast(d38)
          - col("__t").cast(d38)).as("__tie"))
    val n = col("n_nz").cast(d38)
    val num = lit(2).cast(d38) * col("__w2") - n * (n + 1)
    val var16 = (lit(2).cast(d38) * n * (n + 1) * (lit(2).cast(d38) * n + 1)
      - col("__tie")).cast("double") / lit(3.0)
    g.select(col("grp"), col("n_nz"), col("__w2").cast("long").as("w2"),
        NumFunctions.roundNz(num.cast("double") / sqrt(var16), 6).as("z_r"))
      .withColumn("significant", abs(col("z_r")) > 1.96)
  }

  /** Spearman rank correlation per group (Spearman 1904; the
    * tie-corrected Pearson-on-midranks form): the monotone-association
    * companion of the q73 Pearson — a length metric and a token count
    * can be perfectly rank-correlated while wildly non-linear, and a
    * heavy tail can't drag ranks the way it drags raw moments.
    *
    * Exactness: midranks carry in DOUBLED units per metric
    * (`rank2 = 2·cum_before + t + 1` over each group's distinct
    * values, exact integers), both rank columns join back by value
    * (key-local), and the correlation is the textbook
    * `(nΣxy − ΣxΣy) / (√(nΣxx − Σx²)·√(nΣyy − Σy²))` over exact
    * DECIMAL(38,0) rank sums — the 2× unit scales cancel — with one
    * fixed chain of IEEE ops, rounded at the edge. A metric constant
    * within a group has zero rank variance → null rho (undefined).
    *
    * Scale shape: two (group, value) collapses with group-partitioned
    * rank windows over the bounded value supports, two key-local
    * equi-joins back to the rows, one final collapse. The
    * [[cliffsDelta]] window convention throughout.
    *
    * Returns `(grp, n, rho_r)`.
    */
  def spearmanRho(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    // the projection feeds both rank tables AND the row-level join
    // chain (three references) — persist it or the upstream recomputes
    // per branch. This cache is CORPUS-SCALE (one row per doc), not
    // classificationReport's K²-bounded state: it drops only when the
    // ContextCleaner collects the returned frame, so long sessions
    // should materialize each result promptly
    val base = df.select(col(groupCol).as("grp"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def rank2(vCol: String, out: String) = {
      val wCum = Window.partitionBy(col("grp")).orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.groupBy(col("grp"), col(vCol))
        .agg(count(lit(1)).as("__t"))
        .withColumn(out, lit(2L) * (sum(col("__t")).over(wCum) - col("__t"))
          + col("__t") + 1)
        .drop("__t")
    }
    val g = base
      .join(rank2("__x", "__rx"), Seq("grp", "__x"))
      .join(rank2("__y", "__ry"), Seq("grp", "__y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("__rx").cast(d38)).as("__sx"),
        sum(col("__ry").cast(d38)).as("__sy"),
        sum(col("__rx").cast(d38) * col("__rx").cast(d38)).as("__sxx"),
        sum(col("__ry").cast(d38) * col("__ry").cast(d38)).as("__syy"),
        sum(col("__rx").cast(d38) * col("__ry").cast(d38)).as("__sxy"))
    val n = col("n").cast(d38)
    val vx = n * col("__sxx") - col("__sx") * col("__sx")
    val vy = n * col("__syy") - col("__sy") * col("__sy")
    val num = n * col("__sxy") - col("__sx") * col("__sy")
    g.select(col("grp"), col("n"),
      when(vx === 0 || vy === 0, lit(null).cast("double"))
        .otherwise(NumFunctions.roundNz(num.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))), 6))
        .as("rho_r"))
  }

  /** Kendall's coefficient of concordance W per group (Kendall &
    * Babington Smith, Annals of Math. Stat. 1939; the tie-corrected
    * form): do k judges RANK the same items consistently — the ordinal
    * companion of [[fleissKappa]]/[[krippendorffAlpha]] (those score
    * label agreement; W scores ORDER agreement, the right question
    * when annotators grade quality on a scale rather than pick a
    * class). W = 1: every judge induces the same order; W = 0: the
    * rank sums are indistinguishable from chance.
    *
    * Exactness: each judge's scores midrank in DOUBLED units over the
    * judge's value support (`r2 = 2·cum_before + t + 1`, the
    * [[wilcoxonSignedRank]]/[[spearmanRho]] discipline), so
    * `ΣR2²` (squared per-item rank sums) is an exact DECIMAL(38,0)
    * and the tie-corrected statistic clears every fraction:
    * `W = 3·(ΣR2² − k²n(n+1)²) / (k²n(n²−1) − k·ΣT)` with
    * `T_j = Σ(t³−t)` per judge — one division of two exact integers,
    * rounded at the edge. Each GROUP requires a complete panel: every
    * judge scores every item exactly once; groups violating that (or
    * with fewer than 2 items or 2 judges) report null W with the
    * counts surfaced so the gap is visible, never silently scored.
    *
    * Scale shape: one collapse to (group, judge, score) tie groups;
    * rank windows partition by (group, judge) over the bounded value
    * support; one key-local join back to the ratings; two group-grain
    * collapses. The shared projection persists (it feeds the
    * completeness check, the rank tables, and the join) — a
    * CORPUS-SCALE cache (one row per rating) reclaimed only when the
    * ContextCleaner collects the returned frame, so long sessions
    * should materialize each result promptly.
    *
    * Returns `(grp, n_items, k_judges, complete, w_r)`.
    */
  def kendallW(ratings: DataFrame, groupCol: String, itemCol: String,
               judgeCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val base = ratings.filter(col(scoreCol).isNotNull)
      .select(col(groupCol).as("grp"), col(itemCol).as("__item"),
        col(judgeCol).as("__judge"), col(scoreCol).cast("long").as("__s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // completeness: n_items × k_judges distinct cells, one rating each
    // — all via two-level aggregation (the kAnonymityAudit no-Expand
    // discipline), never count_distinct's row expansion
    val cellCounts = base
      .groupBy(col("grp"), col("__item"), col("__judge"))
      .agg(count(lit(1)).as("__c"))
    val shape = cellCounts.groupBy(col("grp"))
      .agg(count(lit(1)).as("__cells"), max(col("__c")).as("__maxc"))
      .join(cellCounts.select(col("grp"), col("__item")).distinct()
        .groupBy(col("grp")).agg(count(lit(1)).as("n_items")), "grp")
      .join(cellCounts.select(col("grp"), col("__judge")).distinct()
        .groupBy(col("grp")).agg(count(lit(1)).as("k_judges")), "grp")
    // doubled midranks per (group, judge) over that judge's score ties
    val c = base.groupBy(col("grp"), col("__judge"), col("__s"))
      .agg(count(lit(1)).as("__t"))
    val wCum = Window.partitionBy(col("grp"), col("__judge"))
      .orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = c
      .withColumn("__r2", lit(2L) * (sum(col("__t")).over(wCum) - col("__t"))
        + col("__t") + 1)
    val tSum = ranked.groupBy(col("grp"))
      .agg(sum(col("__t").cast(d38) * col("__t").cast(d38) *
        col("__t").cast(d38) - col("__t").cast(d38)).as("__T"))
    val r2sq = base
      .join(ranked.select(col("grp"), col("__judge"), col("__s"),
        col("__r2")), Seq("grp", "__judge", "__s"))
      .groupBy(col("grp"), col("__item"))
      .agg(sum(col("__r2")).as("__R2"))
      .groupBy(col("grp"))
      .agg(sum(col("__R2").cast(d38) * col("__R2").cast(d38)).as("__SR2"))
    val n = col("n_items").cast(d38)
    val k = col("k_judges").cast(d38)
    val num = lit(3).cast(d38) * (col("__SR2") - k * k * n * (n + 1) * (n + 1))
    val den = k * k * n * (n * n - 1) - k * col("__T")
    shape.join(r2sq, "grp").join(tSum, "grp")
      .withColumn("complete",
        col("__cells") === col("n_items") * col("k_judges") &&
          col("__maxc") === 1L)
      .select(col("grp"), col("n_items"), col("k_judges"), col("complete"),
        when(!col("complete") || col("n_items") < 2 || col("k_judges") < 2
            || den === 0, lit(null).cast("double"))
          .otherwise(NumFunctions.roundNz(
            num.cast("double") / den.cast("double"), 6)).as("w_r"))
  }

  /** Benjamini-Hochberg FDR step-up over a battery of test gates
    * (Benjamini & Hochberg, JRSS-B 1995): a pipeline that runs one
    * significance test per (filter, slice) cell runs HUNDREDS of them
    * — at α = 0.05, five "significant" regressions per hundred gates
    * are expected from noise alone. BH controls the FALSE DISCOVERY
    * RATE: sort the m p-values ascending, find the largest rank k with
    * `p_(k) ≤ k·q/m`, reject exactly ranks 1..k. The triage step
    * between the per-gate tests ([[mcnemarGate]],
    * [[pairedPermutationTest]]) and any action on their alarms.
    *
    * Exactness: p-values arrive as integer PARTS-PER-MILLION (the
    * fixed-point convention of [[binaryScoreEval]]), so the step-up
    * comparison clears denominators — `p_ppm·m ≤ rank·q_ppm`, exact
    * longs, no float boundary. The BH-ADJUSTED p-value (the smallest
    * q at which each gate would be rejected,
    * `min_{j ≥ i} m·p_(j)/j` capped at 1) is one exact-integer
    * division per gate followed by a running min from the bottom,
    * rounded at the edge. Ties on p break by gate name, so rank — and
    * therefore the whole report — is a total order.
    *
    * Scale shape: gates are METADATA by contract (one row per test
    * cell, ≤ thousands — never document grain), so the partition-less
    * rank/min windows run over a bounded set (the documented
    * bounded-window convention, [[binaryScoreEval]]'s fixed-point
    * support bound).
    *
    * Returns `(test, p_ppm, m, rank, adj_p_r, rejected)`.
    */
  def bhFdr(tests: DataFrame, testCol: String, pPpmCol: String,
            qPpm: Long = 50000L): DataFrame = {
    require(qPpm >= 1 && qPpm <= 1000000L,
      s"qPpm must be in [1, 1e6], got $qPpm")
    import org.apache.spark.sql.expressions.Window
    val wAsc = Window.orderBy(col("p_ppm").asc, col("test").asc)
    val wAll = wAsc.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val wTail = wAsc.rowsBetween(Window.currentRow,
      Window.unboundedFollowing)
    tests
      .select(col(testCol).cast("string").as("test"),
        col(pPpmCol).cast("long").as("p_ppm"))
      .withColumn("rank", row_number().over(wAsc).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("__raw", least(lit(1.0),
        (col("p_ppm") * col("m")).cast("double") /
          (col("rank") * lit(1000000L)).cast("double")))
      .withColumn("adj_p_r", NumFunctions.roundNz(
        min(col("__raw")).over(wTail), 6))
      .withColumn("__k", max(when(
        col("p_ppm") * col("m") <= col("rank") * qPpm, col("rank"))
        .otherwise(lit(0L))).over(wAll))
      .withColumn("rejected", col("rank") <= col("__k"))
      .select(col("test"), col("p_ppm"), col("m"), col("rank"),
        col("adj_p_r"), col("rejected"))
  }
}
