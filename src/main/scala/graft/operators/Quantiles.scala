package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT per-group quantiles without buffering any group on a reducer —
  * the scale path for `percentile`'s documented limitation (its
  * aggregation state holds every value of a group in memory — the
  * [[Drift]] escape-hatch note) at 100 TB.
  *
  * Algorithm: per-group histogram bisection — the distributed
  * selection scheme whose cluster primitive is a COUNTING pass. Each
  * requested quantile needs (at most) the two order statistics at
  * adjacent ranks ⌊f⌋+1 and ⌈f⌉+1 (f = (n−1)·p). Ranks that currently
  * target the same candidate region share one COHORT — and therefore
  * one counting cohort-row — so resolving a LIST of quantiles shares
  * every pass over regions the ranks have not yet split apart on
  * (round 1 is always fully shared: every rank starts in [min, max]).
  * Every round runs ONE Spark job: the base relation joins a small
  * per-round bounds table `(g, slot, lo, hi, terminal)` — broadcast
  * while it stays under `broadcastBoundsRows`, an ordinary shuffled
  * equi-join beyond that, never a plan-embedded literal, so extreme
  * group cardinality degrades to a bigger join instead of a bigger
  * plan — and aggregates per (group, slot, key) where the key is the
  * equi-width bin for bisecting cohorts and the raw VALUE for terminal
  * ones (a region whose population has fallen to `collectLimit`, whose
  * exact order statistics come from its bounded per-value histogram).
  * Per-bin min/max ride along so regions tighten to ACTUAL data
  * bounds — the invariant that guarantees strict progress: a region
  * holding ≥ 2 distinct values always splits across [min, max]-based
  * bins, and a single-valued region resolves immediately. Duplicates,
  * skew, and adversarial distributions change only the round count,
  * never the memory bound: the cluster materializes ≤
  * Σ_cohorts max(bins, collectLimit) counters per round and the driver
  * holds O(|groups|·|ps|) scalar search states.
  *
  * The result `v₁ + (v₂−v₁)·frac` is DuckDB `quantile_cont`'s exact
  * arithmetic form (bit-identical given the same order statistics) and
  * the same mathematical definition as Spark `percentile` — which
  * evaluates the equivalent `v₁·(1−frac) + v₂·frac` and can differ in
  * the final ulp; consumers comparing across engines round (the query
  * layer rounds to 6, the established oracle convention).
  */
object Quantiles {

  /** One live search region: every rank in `ranks` has exactly
    * `r0` values below `lo` and its order statistic inside [lo, hi].
    */
  private case class Cohort(g: String, lo: Double, hi: Double, r0: Long,
                            term: Boolean, ranks: List[Long])

  private case class BinStat(c: Long, mn: Double, mx: Double)

  /** Physical plan of the final round's pass — test hook for the
    * bounds-join contract (broadcast under the row limit).
    */
  @volatile private[graft] var lastRoundPlan: String = ""

  /** Exact interpolated quantiles at every `p` in `ps` per group: one
    * row per (group, p) — `(groupCol, p, n, q)`. Counting passes are
    * shared across the requested quantiles wherever their searches
    * still target the same region, so a p01/p50/p99 sweep costs far
    * less than three independent scans (BASELINE.md `quantile_scan`).
    * Runs O(log_bins range) counting jobs plus bounded terminal
    * aggregates; the input is re-scanned each round — cache it first
    * if it is not already a cheap columnar scan.
    */
  def quantileScanMulti(df: DataFrame, groupCol: String, valueCol: String,
                        ps: Seq[Double], bins: Int = 256,
                        collectLimit: Int = 4096, maxRounds: Int = 256,
                        broadcastBoundsRows: Int = 1000000): DataFrame = {
    require(ps.nonEmpty, "need at least one quantile")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"every p must be in [0,1], got $ps")
    require(ps.distinct.size == ps.size, s"duplicate quantiles in $ps")
    require(bins >= 2 && collectLimit >= 1, "bins/collectLimit too small")
    val spark = df.sparkSession
    import spark.implicits._

    // NaN is excluded along with null: NaN passes isNotNull, would be
    // counted in n, and under Spark's NaN-is-largest ordering poisons
    // the group max — breaking the counting invariants the bisection
    // relies on. DuckDB quantile_cont likewise ignores NULLs; callers
    // with NaN-significant data must pre-map NaN explicitly.
    val base = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))

    // round 0: per-group n / min / max — one pass
    val stats = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap

    // per (group, p): the two rank targets and the interpolation frac
    val targets = for ((g, (n, _, _)) <- stats.toSeq; p <- ps) yield {
      val f = (n - 1) * p
      (g, p, math.floor(f).toLong + 1, math.ceil(f).toLong + 1, f - math.floor(f))
    }
    val done = scala.collection.mutable.Map.empty[(String, Long), Double]

    var cohorts: List[Cohort] = stats.toList.flatMap { case (g, (n, mn, mx)) =>
      val ranks = targets.collect { case (`g`, _, k1, k2, _) => Seq(k1, k2) }
        .flatten.distinct.sorted.toList
      if (mn == mx) { ranks.foreach(k => done((g, k)) = mn); Nil }
      else List(Cohort(g, mn, mx, 0L, term = n <= collectLimit, ranks))
    }

    var rounds = 0
    while (cohorts.nonEmpty && rounds < maxRounds) {
      rounds += 1
      // slot = cohort ordinal within its group; the (g, slot) pair keys
      // this round's counting rows back to their cohort
      val slotted = cohorts.groupBy(_.g).toSeq.flatMap { case (_, cs) =>
        cs.zipWithIndex.map { case (c, s) => (s, c) }
      }
      val boundsDf = slotted
        .map { case (s, c) => (c.g, s, c.lo, c.hi, c.term) }
        .toDF("g", "__s", "__lo", "__hi", "__term")
      val bounds =
        if (slotted.size <= broadcastBoundsRows) broadcast(boundsDf)
        else boundsDf

      val w = (col("__hi") - col("__lo")) / bins
      val keyCol = when(col("__term"), col("v")).otherwise(
        when(w > 0.0, least(lit(bins - 1), greatest(lit(0),
          floor((col("v") - col("__lo")) / w).cast("int"))))
          .otherwise(lit(0)).cast("double"))
      val agg = base.join(bounds, Seq("g"))
        .filter(col("v") >= col("__lo") && col("v") <= col("__hi"))
        .groupBy(col("g"), col("__s"), keyCol.as("k"))
        .agg(count(lit(1)).as("c"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      val collected: Map[(String, Int), Map[Double, BinStat]] = agg.collect()
        .groupBy(r => (r.getString(0), r.getInt(1)))
        .view.mapValues(_.map(r => r.getDouble(2) ->
          BinStat(r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap)
        .toMap
      lastRoundPlan = agg.queryExecution.executedPlan.toString

      cohorts = slotted.toList.flatMap { case (s, c) =>
        val mine = collected.getOrElse((c.g, s), Map.empty[Double, BinStat])
        if (c.term) {
          // exact order statistics from the region's per-VALUE
          // histogram — ≤ collectLimit rows by construction
          val vs = mine.toSeq.map { case (v, st) => (v, st.c) }.sortBy(_._1)
          c.ranks.foreach { k =>
            var acc = c.r0; var i = 0
            while (acc + vs(i)._2 < k) { acc += vs(i)._2; i += 1 }
            done((c.g, k)) = vs(i)._1
          }
          Nil
        } else {
          val cs = Array.tabulate(bins)(b =>
            mine.getOrElse(b.toDouble, BinStat(0L, Double.NaN, Double.NaN)))
          val total = cs.map(_.c).sum
          val regionMin = cs.filter(_.c > 0).map(_.mn).min
          val regionMax = cs.filter(_.c > 0).map(_.mx).max
          if (regionMin == regionMax) {
            c.ranks.foreach(k => done((c.g, k)) = regionMin) // single value
            Nil
          } else if (total <= collectLimit) {
            List(c.copy(term = true, lo = regionMin, hi = regionMax))
          } else {
            // each rank walks the shared histogram to its bin; ranks
            // landing in the same bin STAY one cohort (shared pass)
            c.ranks.groupBy { k =>
              var acc = 0L; var b = 0
              while (acc + cs(b).c < k - c.r0) { acc += cs(b).c; b += 1 }
              (b, acc)
            }.toList.map { case ((b, acc), ks) =>
              // tighten to the slot's OBSERVED bounds, not its
              // arithmetic edges — what makes every round progress
              if (cs(b).mn == cs(b).mx) {
                ks.foreach(k => done((c.g, k)) = cs(b).mn); None
              } else Some(Cohort(c.g, cs(b).mn, cs(b).mx, c.r0 + acc,
                term = cs(b).c <= collectLimit, ks))
            }.flatten
          }
        }
      }
    }
    require(cohorts.isEmpty,
      s"quantile bisection did not converge in $maxRounds rounds")

    targets.map { case (g, p, k1, k2, frac) =>
      val v1 = done((g, k1))
      val v2 = done((g, k2))
      (g, p, stats(g)._1, v1 + (v2 - v1) * frac)
    }.toDF(groupCol, "p", "n", "q")
  }

  /** Exact interpolated `p`-quantile per group: one row per group,
    * `(groupCol, n, q)` — the single-quantile view of
    * [[quantileScanMulti]].
    */
  def quantileScan(df: DataFrame, groupCol: String, valueCol: String,
                   p: Double, bins: Int = 256, collectLimit: Int = 4096,
                   maxRounds: Int = 256): DataFrame =
    quantileScanMulti(df, groupCol, valueCol, Seq(p), bins, collectLimit,
      maxRounds)
      .select(col(groupCol), col("n"), col("q"))
}
