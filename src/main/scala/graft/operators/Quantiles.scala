package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT per-group quantiles without buffering any group on a reducer —
  * the scale path for `percentile`'s documented limitation (its
  * aggregation state holds every value of a group in memory — the
  * [[Drift]] escape-hatch note) at 100 TB.
  *
  * Algorithm: per-group histogram bisection — the distributed
  * selection scheme whose cluster primitive is a COUNTING pass. The
  * interpolated quantile needs (at most) the two order statistics at
  * adjacent ranks ⌊f⌋+1 and ⌈f⌉+1 (f = (n−1)·p); each rank runs its
  * OWN search so a round always narrows every live search to a single
  * histogram slot — a `bins`× shrink per round, regardless of where
  * the two ranks land. Every round bins each search's candidate region
  * `[lo, hi]` into `bins` equi-width slots with one shared
  * partial-aggregating pass, the driver walks the counts to the slot
  * holding the target rank; when a region's population falls to
  * `collectLimit` — or the region can no longer split in double
  * precision (heavy duplicate mass) — the exact value comes from a
  * bounded per-VALUE histogram of the region. Duplicates, skew, and
  * adversarial distributions change only the round count, never the
  * memory bound: the cluster materializes ≤ 2·|groups|·bins counters
  * per round and the driver holds 2·|groups| scalar states.
  *
  * The result `v₁ + (v₂−v₁)·frac` is DuckDB `quantile_cont`'s exact
  * arithmetic form (bit-identical given the same order statistics) and
  * the same mathematical definition as Spark `percentile` — which
  * evaluates the equivalent `v₁·(1−frac) + v₂·frac` and can differ in
  * the final ulp; consumers comparing across engines round (the query
  * layer rounds to 6, the established oracle convention).
  */
object Quantiles {

  private case class Search(lo: Double, hi: Double, r0: Long, k: Long,
                            terminal: Boolean, done: Option[Double])

  /** Exact interpolated `p`-quantile per group: one row per group,
    * `(groupCol, n, q)`. Runs O(log_bins range) counting jobs plus
    * bounded terminal aggregates; the input is re-scanned each round —
    * cache it first if it is not already a cheap columnar scan.
    */
  def quantileScan(df: DataFrame, groupCol: String, valueCol: String,
                   p: Double, bins: Int = 256, collectLimit: Int = 4096,
                   maxRounds: Int = 256): DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"p must be in [0,1], got $p")
    require(bins >= 2 && collectLimit >= 1, "bins/collectLimit too small")
    val spark = df.sparkSession
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
    val meta = stats.map { case (g, (n, _, _)) =>
      val f = (n - 1) * p
      g -> ((n, math.floor(f).toLong + 1, math.ceil(f).toLong + 1, f - math.floor(f)))
    }
    // one search per needed rank; k1 == k2 collapses to one
    var searches: Map[(String, Int), Search] = stats.flatMap {
      case (g, (n, mn, mx)) =>
        val (_, k1, k2, _) = meta(g)
        val ranks = if (k1 == k2) Seq(1 -> k1) else Seq(1 -> k1, 2 -> k2)
        ranks.map { case (idx, k) =>
          (g, idx) -> Search(mn, mx, 0L, k,
            terminal = n <= collectLimit, done = if (mn == mx) Some(mn) else None)
        }
    }

    case class BinStat(c: Long, mn: Double, mx: Double)

    // one job per search index (≤ 2), each a map-filtered aggregate;
    // per-bin min/max ride along so regions tighten to ACTUAL data
    // bounds — the invariant that guarantees strict progress: a region
    // holding ≥ 2 distinct values always splits across [min, max]-based
    // bins, and a single-valued region resolves immediately
    def histPass(live: Map[(String, Int), Search],
                 binned: Boolean): Map[((String, Int), Any), BinStat] = {
      live.keys.map(_._2).toSet.toSeq.flatMap { idx: Int =>
        val sub = live.filter(_._1._2 == idx)
        val loCol = typedlit(sub.map { case ((g, _), s) => g -> s.lo })
        val hiCol = typedlit(sub.map { case ((g, _), s) => g -> s.hi })
        val inRegion = element_at(loCol, col("g")).isNotNull &&
          col("v") >= element_at(loCol, col("g")) &&
          col("v") <= element_at(hiCol, col("g"))
        val keyCol =
          if (binned) {
            val w = (element_at(hiCol, col("g")) - element_at(loCol, col("g"))) / bins
            when(w > 0.0, least(lit(bins - 1), greatest(lit(0),
              floor((col("v") - element_at(loCol, col("g"))) / w).cast("int"))))
              .otherwise(lit(0)).cast("double")
          } else col("v")
        base.filter(inRegion)
          .groupBy(col("g"), keyCol.as("k"))
          .agg(count(lit(1)).as("c"), min(col("v")).as("mn"), max(col("v")).as("mx"))
          .collect()
          .map(r => (((r.getString(0), idx): (String, Int)),
            r.getDouble(1).asInstanceOf[Any]) ->
            BinStat(r.getLong(2), r.getDouble(3), r.getDouble(4)))
      }.toMap
    }

    var rounds = 0
    while (searches.values.exists(_.done.isEmpty) && rounds < maxRounds) {
      rounds += 1
      val open = searches.filter(_._2.done.isEmpty)
      val (term, bisect) = open.partition(_._2.terminal)

      if (bisect.nonEmpty) {
        val stats = histPass(bisect, binned = true)
        searches = searches ++ bisect.map { case (key, s) =>
          val cs = Array.tabulate(bins)(b =>
            stats.getOrElse((key, b.toDouble), BinStat(0L, Double.NaN, Double.NaN)))
          val total = cs.map(_.c).sum
          val regionMin = cs.filter(_.c > 0).map(_.mn).min
          val regionMax = cs.filter(_.c > 0).map(_.mx).max
          if (regionMin == regionMax)
            key -> s.copy(done = Some(regionMin)) // single-valued region
          else if (total <= collectLimit)
            key -> s.copy(terminal = true, lo = regionMin, hi = regionMax)
          else {
            var acc = 0L; var b = 0
            while (acc + cs(b).c < s.k - s.r0) { acc += cs(b).c; b += 1 }
            // tighten to the slot's OBSERVED bounds, not its arithmetic
            // edges — this is what makes every round strict progress
            key -> s.copy(lo = cs(b).mn, hi = cs(b).mx, r0 = s.r0 + acc)
          }
        }
      }

      if (term.nonEmpty) {
        // exact order statistic from the region's per-VALUE histogram —
        // ≤ collectLimit rows per search by construction
        val hist = histPass(term, binned = false)
          .groupBy(_._1._1).map { case (key, m) =>
            key -> m.toSeq.map { case ((_, v), st) => (v.asInstanceOf[Double], st.c) }
              .sortBy(_._1)
          }
        searches = searches ++ term.map { case (key, s) =>
          val vs = hist(key)
          var acc = s.r0; var i = 0
          while (acc + vs(i)._2 < s.k) { acc += vs(i)._2; i += 1 }
          key -> s.copy(done = Some(vs(i)._1))
        }
      }
    }
    require(searches.values.forall(_.done.isDefined),
      s"quantile bisection did not converge in $maxRounds rounds")

    import spark.implicits._
    meta.toSeq.map { case (g, (n, _, _, frac)) =>
      val v1 = searches((g, 1)).done.get
      val v2 = searches.get((g, 2)).map(_.done.get).getOrElse(v1)
      (g, n, v1 + (v2 - v1) * frac)
    }.toDF(groupCol, "n", "q")
  }
}
