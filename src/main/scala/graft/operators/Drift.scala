package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.NumFunctions

/** Distribution-drift profiling between two loads of the same feature —
  * the monitoring pass a production pipeline runs before trusting new
  * data: bin the CURRENT batch on the REFERENCE batch's decile cutoffs
  * and compare per-bin population shares (the Population Stability
  * Index decomposition; PSI = Σ (p−q)·ln(p/q) over bins, standard in
  * model monitoring). A reference decile holds ~10 % by construction,
  * so a current bin drifting to 2 % or 30 % is visible immediately —
  * and because the cutoffs come from the reference only, a drifted
  * current batch cannot hide by moving the bin edges.
  *
  * Scale design: one partial-aggregating shuffle per side computes the
  * cutoffs (reference) and the bin counts; the cutoff table (one row
  * per group, a 9-double array) joins back by group key — AQE
  * broadcasts it — and binning is a STATIC nine-comparison sum over
  * `element_at`, fully codegen'd: no interpreted lambda, no per-row
  * UDF, no window, no collect. Cutoffs are rounded to 6 places before
  * any comparison so engines bin identically at the boundaries.
  *
  * `percentile` is EXACT (oracle-checkable) but buffers each group's
  * reference values on one reducer; for billion-row reference groups
  * swap to `approx_percentile` — fixed-size sketch, same binning — with
  * approximate edges (drift monitoring rarely cares), or to
  * [[Quantiles.quantileScan]] when the edges must stay EXACT at any
  * group size (O(log) counting passes, no reducer-side buffering —
  * measured 3.7–4.5× faster than the buffering path already at 20–80 M
  * rows, BASELINE.md `quantile_scan`).
  */
object Drift {

  /** Per (group, bin) drift rows between `ref` and `cur`: bin 0–9 from
    * the reference's rounded decile cutoffs, each side's count and
    * share, and the bin's PSI term `(p−q)·ln(p/q)` (null when either
    * share is zero — the standard ε-free presentation; sum the non-null
    * terms for the scalar PSI). Null values are excluded on both sides
    * (they carry no position in the distribution).
    */
  def psiProfile(ref: DataFrame, cur: DataFrame, groupCol: String,
                 valueCol: String): DataFrame =
    binShares(ref, cur, groupCol, valueCol)
      .withColumn("psi_term",
        when(col("p_ref") > 0.0 && col("p_cur") > 0.0,
          NumFunctions.roundNz((col("p_ref") - col("p_cur")) * log(col("p_ref") / col("p_cur")), 6)))
      .select(col(groupCol), col("bin"), col("n_ref"), col("n_cur"),
        col("p_ref"), col("p_cur"), col("psi_term"))

  /** Two-sample Kolmogorov–Smirnov statistic per group, discretized at
    * the reference's decile cutoffs: D = max over bin edges of
    * |F_ref − F_cur| where F is the empirical CDF accumulated over the
    * SAME ten bins `psiProfile` compares. The discretized D lower-bounds
    * the continuous-data statistic (the sup over a coarser edge set) and
    * is exactly reproducible by any engine that bins identically — which
    * is the monitoring contract here: cutoffs are rounded to 6 places
    * before comparison, so the binning (and hence D) is bit-stable.
    * Complements PSI: KS reads maximum CDF separation (location shifts),
    * PSI reads summed density ratios (shape/tail changes).
    *
    * Scale design: everything after the per-side bin counts (one
    * partial-aggregating shuffle each, shared with `psiProfile`'s shape)
    * operates on ≤ 10 rows per group — the CDF window is bounded by the
    * bin count, never by the data.
    */
  def ksProfile(ref: DataFrame, cur: DataFrame, groupCol: String,
                valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    binShares(ref, cur, groupCol, valueCol)
      .withColumn("__fr", sum(col("n_ref")).over(w))
      .withColumn("__fc", sum(col("n_cur")).over(w))
      .withColumn("__tr", sum(col("n_ref")).over(wAll))
      .withColumn("__tc", sum(col("n_cur")).over(wAll))
      .withColumn("__d", abs(
        col("__fr").cast("double") / col("__tr") -
        col("__fc").cast("double") / col("__tc")))
      .groupBy(col(groupCol))
      .agg(
        NumFunctions.roundNz(max(col("__d")), 6).as("ks_d"),
        max(col("__tr")).as("n_ref"),
        max(col("__tc")).as("n_cur"))
  }

  /** Exact 1-Wasserstein (earth mover's) distance per group between the
    * two samples' empirical distributions:
    * `W1 = Σ |F_ref(v) − F_cur(v)| · Δv` over adjacent DISTINCT values
    * of the merged support (the closed form of the transport problem in
    * one dimension — Vallender 1974). Complements the family: KS reads
    * the existence of a shift (max CDF gap, scale-free), PSI its shape
    * (density ratios over bins), W1 its MAGNITUDE in value units (how
    * far mass actually moved) — the number a monitoring page can alarm
    * on with a unit-bearing threshold. No binning: the exact statistic.
    *
    * Determinism: CDF levels are integer cumulative counts divided once
    * (IEEE, identical on any engine); each `|ΔF| · Δv` term routes
    * through DECIMAL(18,9) before the per-group sum (the q67 recipe),
    * so summation order cannot change a bit. Nulls and NaNs are
    * excluded; groups present in only one sample are omitted (W1
    * against an empty distribution is undefined). A group present in
    * BOTH samples always yields a row — including the
    * constant-and-equal case (a single shared distinct value), where
    * W1 = 0 is well-defined and n_ref/n_cur remain reportable.
    *
    * Scale design: rows collapse FIRST to per-(group, value) counts —
    * one partial-aggregating shuffle per side bounded by the distinct
    * value set, not the row count; the CDF cumsum, totals, and
    * adjacent-difference windows all carry a partition spec and run
    * over distinct values per group; the term sum partial-aggregates.
    * For groups whose distinct-value set is itself billions, quantize
    * values upstream (the standard ε-approximation) — the operator is
    * exact for whatever support it is given.
    */
  def w1Profile(ref: DataFrame, cur: DataFrame, groupCol: String,
                valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def side(df: DataFrame, mine: String, other: String): DataFrame =
      df.select(col(groupCol), col(valueCol).cast("double").as("__v"))
        .filter(col("__v").isNotNull && !isnan(col("__v")))
        .groupBy(col(groupCol), col("__v"))
        .agg(count(lit(1)).as(mine))
        .withColumn(other, lit(0L))
        .select(col(groupCol), col("__v"), col("n_ref"), col("n_cur"))
    val merged = side(ref, "n_ref", "n_cur")
      .unionByName(side(cur, "n_cur", "n_ref"))
      .groupBy(col(groupCol), col("__v"))
      .agg(sum(col("n_ref")).as("n_ref"), sum(col("n_cur")).as("n_cur"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    merged
      .withColumn("__fr", sum(col("n_ref")).over(wCum))
      .withColumn("__fc", sum(col("n_cur")).over(wCum))
      .withColumn("__tr", sum(col("n_ref")).over(wAll))
      .withColumn("__tc", sum(col("n_cur")).over(wAll))
      .withColumn("__dv", lead(col("__v"), 1).over(w) - col("__v"))
      // presence filter only — each group's LAST support row (dv null)
      // survives with a 0 term, so two-sided groups always emit a row,
      // including the singleton-support W1 = 0 case
      .filter(col("__tr") > 0 && col("__tc") > 0)
      .withColumn("__term",
        when(col("__dv").isNotNull,
          abs(col("__fr").cast("double") / col("__tr") -
              col("__fc").cast("double") / col("__tc")) * col("__dv"))
          .otherwise(lit(0.0))
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)))
      .groupBy(col(groupCol))
      .agg(
        NumFunctions.roundNz(sum(col("__term")).cast("double"), 6).as("w1"),
        max(col("__tr")).as("n_ref"),
        max(col("__tc")).as("n_cur"))
  }

  /** Robust per-group outlier profile by median absolute deviation
    * (Hampel 1974; the robust-statistics alternative to mean±kσ): a
    * value is an outlier when `|v − median| > k · MAD` with
    * `MAD = median(|v − median|)`. Unlike z-scores, both location and
    * scale estimates have a 50 % breakdown point, so the outliers
    * themselves cannot drag the threshold — the property that matters
    * when screening a feed whose corruption rate is unknown.
    *
    * Returns one row per group: `(group, n, n_outliers, med_r, mad_r)`
    * with the estimates rounded to 6 places (negative zero
    * normalized); the outlier comparison uses the UNROUNDED estimates,
    * identical IEEE arithmetic to the DuckDB oracle.
    *
    * Scale design: two exact-`percentile` aggregations (values, then
    * deviations) plus two group-keyed joins that AQE broadcasts when
    * the group table is small; the final count is one
    * partial-aggregating shuffle. Exact `percentile` buffers each
    * group's values on one reducer; for billion-row groups set
    * `useScan = true` and both medians come from
    * [[Quantiles.quantileScan]] bisection — bounded counting state,
    * still exact selection (the two interpolation forms can differ in
    * the final ulp; the rounded outputs agree, and the unrounded
    * outlier comparison flips only on an exact `k·MAD` tie).
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.0, useScan: Boolean = false): DataFrame = {
    require(k > 0.0, s"need k > 0, got $k")
    val nonNull = df.filter(col(valueCol).isNotNull)
    val med =
      if (useScan)
        Quantiles.quantileScan(nonNull, groupCol, valueCol, 0.5)
          .select(col(groupCol), col("q").as("__med"))
      else nonNull.groupBy(col(groupCol))
        .agg(expr(s"percentile($valueCol, 0.5D)").as("__med"))
    val dev = nonNull.join(med, Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad =
      if (useScan)
        Quantiles.quantileScan(dev, groupCol, "__dev", 0.5)
          .select(col(groupCol), col("q").as("__mad"))
      else dev.groupBy(col(groupCol))
        .agg(expr("percentile(__dev, 0.5D)").as("__mad"))
    dev.join(mad, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__dev") > lit(k) * col("__mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        NumFunctions.roundNz(max(col("__med")), 6).as("med_r"),
        NumFunctions.roundNz(max(col("__mad")), 6).as("mad_r"))
  }

  /** Chi-square test of homogeneity per group (Pearson 1900), over the
    * SAME ten reference-decile bins [[psiProfile]] and [[ksProfile]]
    * compare — the proper TEST STATISTIC next to those descriptive
    * measures: PSI says how far the shares moved, KS where the CDFs
    * separate; χ² says whether the movement exceeds what sampling
    * noise explains at these row counts. `significant` compares the
    * rounded statistic against the caller's critical value (default
    * 16.918978 = χ²₀.₀₅ at df 9, the full ten-bin case; groups binning
    * coarser report their `n_bins` so the reader can pick the right
    * quantile).
    *
    * Determinism: expected counts are ratios of exact DECIMAL(38,0)
    * integer products (`rowTot·colTot / N`), each cell's contribution
    * `(o − e)²/e` is a fixed IEEE chain FROZEN at 9 places into
    * DECIMAL(28,9) before summation — decimal addition is exact, so
    * the sum is partitioning- and order-independent (the unit-freeze
    * discipline), and the final statistic rounds once at the edge.
    * Bound (the [[Ranks.cliffsDelta]] convention of documenting the
    * frozen type's headroom): a single cell's contribution is at most
    * `max(o, e) ≤ N`, so the integer part fits DECIMAL(28,9) up to
    * N ≈ 10¹⁹ rows per group — beyond any real corpus; the earlier
    * DECIMAL(18,9) capped near 10⁹, which one extreme-drift cell at
    * large row counts could overflow to null (round-16 ADVICE).
    * A side with zero rows in a group has no sampling test: null.
    *
    * Scale shape: [[binShares]]' two partial-aggregating bin counts,
    * then everything operates on ≤ 10 rows per group. No window.
    *
    * Returns `(group, n_ref, n_cur, n_bins, chi2_r, significant)`.
    */
  def chiSquareHomogeneity(ref: DataFrame, cur: DataFrame, groupCol: String,
                           valueCol: String,
                           critChi2: Double = 16.918978): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType => DT}
    // binShares already carries the per-group totals (__tr/__tc) on
    // every row — reuse them; re-aggregating here would evaluate the
    // whole (percentile cuts + two bin counts + full-outer) subplan a
    // second time
    val j = binShares(ref, cur, groupCol, valueCol)
      .select(col(groupCol), col("bin"), col("n_ref"), col("n_cur"),
        col("__tr"), col("__tc"))
      .withColumn("__cb", col("n_ref") + col("n_cur"))
      .withColumn("__n", col("__tr") + col("__tc"))
    def contrib(o: Column, t: Column): Column = {
      val e = (t.cast(DT(38, 0)) * col("__cb").cast(DT(38, 0))).cast("double") /
        col("__n").cast("double")
      // t = 0 ⟺ e = 0 (a one-sided group): contribute 0 here — the
      // group's statistic is nulled by the output guard anyway, and
      // ANSI division must never see the zero
      when(t === 0, lit(0.0))
        .otherwise(NumFunctions.roundNz(
          (o.cast("double") - e) * (o.cast("double") - e) / e, 9))
        .cast(DT(28, 9))
    }
    j.withColumn("__k",
        contrib(col("n_ref"), col("__tr")) + contrib(col("n_cur"), col("__tc")))
      .groupBy(col(groupCol))
      .agg(max(col("__tr")).as("n_ref"), max(col("__tc")).as("n_cur"),
        count(lit(1)).as("n_bins"), sum(col("__k")).as("__s"))
      .select(col(groupCol), col("n_ref"), col("n_cur"), col("n_bins"),
        when(col("n_ref") === 0 || col("n_cur") === 0,
          lit(null).cast("double"))
          .otherwise(NumFunctions.roundNz(col("__s").cast("double"), 6))
          .as("chi2_r"))
      .withColumn("significant", col("chi2_r") > critChi2)
  }

  /** Shared PSI/KS core: per (group, bin) counts and rounded population
    * shares, binned on the reference's rounded decile cutoffs.
    */
  private def binShares(ref: DataFrame, cur: DataFrame, groupCol: String,
                        valueCol: String): DataFrame = {
    val deciles = (1 to 9).map(i =>
      NumFunctions.roundNz(expr(s"percentile($valueCol, 0.${i})"), 6).as(s"__c$i"))
    val cuts = ref.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol)).agg(deciles.head, deciles.tail: _*)

    def binned(side: DataFrame, cntCol: String): DataFrame =
      side.filter(col(valueCol).isNotNull)
        .join(cuts, Seq(groupCol))
        .withColumn("bin",
          (1 to 9).map(i =>
            when(col(valueCol) >= col(s"__c$i"), 1).otherwise(0))
            .reduce(_ + _))
        .groupBy(col(groupCol), col("bin"))
        .agg(count(lit(1)).as(cntCol))

    val r = binned(ref, "n_ref")
    val c = binned(cur, "n_cur")
    // full outer: a bin can be empty on either side (that IS the drift)
    val joined = r.join(c, Seq(groupCol, "bin"), "full_outer")
      .withColumn("n_ref", coalesce(col("n_ref"), lit(0L)))
      .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
    val totals = joined.groupBy(col(groupCol)).agg(
      sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"))
    joined.join(totals, Seq(groupCol))
      .withColumn("p_ref", NumFunctions.roundNz(col("n_ref").cast("double") / col("__tr"), 6))
      .withColumn("p_cur", NumFunctions.roundNz(col("n_cur").cast("double") / col("__tc"), 6))
  }
}
