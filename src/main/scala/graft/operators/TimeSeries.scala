package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.NumFunctions

/** Sensor-series analytics over the engine's event streams — the
  * reference's own domain (air-quality/vision telemetry landed per
  * entity/month, `df_manager.py:56-62`) analyzed, not just stored:
  * regular-grid gap-filling and rolling anomaly detection.
  *
  * Scale design (100 TB): everything is keyed per entity — grids are
  * generated from each key's [min, max] span (map-side explode of a
  * per-key aggregate, never a global calendar cross-join) and every
  * window partitions by the key, so no task sees more than one
  * entity's series. Aggregated values route through exact decimals so
  * replay and partitioning cannot change a byte.
  */
object TimeSeries {

  /** Per-key daily series: exact-decimal sum of `valueCol` per
    * (`keyCol`, day). The single shuffle every downstream pass reuses.
    */
  def dailySeries(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String): DataFrame =
    df.groupBy(col(keyCol), date_trunc("DAY", col(tsCol)).as("d"))
      .agg(sum(col(valueCol).cast(DecimalType(18, 2))).cast("double").as("v"))

  /** Regular-grid gap-filling with forward-fill: each key's series is
    * completed to one row per day over ITS OWN [min, max] span; days
    * with no data carry the last observed value and `is_gap = true`.
    * The grid comes from exploding a per-key `sequence(d0, d1, 1 day)`
    * — span rows are key-count-sized, so the explode is metadata-in,
    * data-out; the fill is one `last(ignoreNulls)` window per key.
    */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String): DataFrame = {
    val daily = dailySeries(df, keyCol, tsCol, valueCol)
    val span = daily.groupBy(col(keyCol))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "d"), "left")
      .select(col(keyCol),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        last(col("v"), ignoreNulls = true).over(w).as("filled"),
        col("v").isNull.as("is_gap"))
  }

  /** Gap-based sessionization — the classic event-log operator: split
    * each key's event stream wherever two consecutive events are more
    * than `gapSeconds` apart, then summarize every session (`start_us`,
    * `end_us`, `n_events`, `span_us`; `session` is the key's 1-based
    * session ordinal). Timestamps route through `unix_micros`, so the
    * boundary test and the span arithmetic are exact longs — no
    * floating-point timestamp math to disagree across engines.
    *
    * Scale design: the break flag (`lag`) and the running session
    * ordinal (prefix sum) are two frames over ONE window — same
    * partition key, same order — and the closing `groupBy(key,
    * session)` groups on a key the window's hash partitioning already
    * clusters, so Catalyst plans the ENTIRE operator behind a single
    * exchange (gated in PlanSpec). Ordering ties break on `tieCol` (a
    * unique id) so replay, partition count, and oracle all see the
    * same session split.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gap must be positive, got $gapSeconds")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__tu"), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapSeconds * 1000000L
    df.select(col(keyCol), col(tieCol), unix_micros(col(tsCol)).as("__tu"))
      .withColumn("__brk",
        when(lag(col("__tu"), 1).over(w).isNull ||
          col("__tu") - lag(col("__tu"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session", sum(col("__brk")).over(run))
      .groupBy(col(keyCol), col("session"))
      .agg(
        min(col("__tu")).as("start_us"),
        max(col("__tu")).as("end_us"),
        count(lit(1)).as("n_events"),
        (max(col("__tu")) - min(col("__tu"))).as("span_us"))
  }

  /** Rolling z-score anomaly detection over the per-key daily series:
    * each day's value against the trailing `win`-day mean/stddev
    * (sample variance, current day included). Window sums route
    * through exact decimals — `sum(decimal)` over a ROWS frame is
    * order-pinned and replay-stable — then the z-score is plain double
    * arithmetic on those exact sums, rounded for the contract.
    * `is_anomaly` compares the ROUNDED score so the flag and the score
    * can never disagree.
    */
  /** Per-EVENT session assignment — [[sessionize]]'s break/cumsum core
    * with the rows kept instead of aggregated: every event gains its
    * key's `session` index (0-based) and `ts_us`. One keyed window,
    * shared by the lag and the running sum.
    */
  def sessionAssign(df: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gap must be positive, got $gapSeconds")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__tu"), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapSeconds * 1000000L
    df.withColumn("__tu", unix_micros(col(tsCol)))
      .withColumn("__brk",
        when(lag(col("__tu"), 1).over(w).isNull ||
          col("__tu") - lag(col("__tu"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session", sum(col("__brk")).over(run) - 1)
      .withColumnRenamed("__tu", "ts_us")
      .drop("__brk", tsCol)
  }

  /** Frequent journeys: the top-`k` most common per-session event-type
    * SEQUENCES — the "what do users actually do" mining pass over
    * sessionized activity (funnels test ONE hypothesis; this surfaces
    * the hypotheses). Returns `(journey, n_sessions)` with the journey
    * as a `>`-joined type string, cut by the total order
    * `(n desc, journey)`.
    *
    * Scale shape: session assignment is ONE keyed window; the sequence
    * build is a per-session aggregate whose `array_sort(struct(ts,
    * tie, type))` orders WITHIN each session's bounded row set (never a
    * global sort); journey counting partial-aggregates and the cut is
    * TakeOrdered.
    */
  def journeys(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
               typeCol: String, gapSeconds: Long, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sess = sessionAssign(df, keyCol, tsCol, tieCol, gapSeconds)
    sess.groupBy(col(keyCol), col("session"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts_us"), col(tieCol), col(typeCol)))),
          x => x.getField(typeCol)),
        ">").as("journey"))
      .groupBy(col("journey")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("journey").asc)
      .limit(k)
  }

  /** Debounce: keep only the FIRST event of every burst per key, where
    * a burst is a run of events each within `gapSeconds` of its
    * predecessor — the duplicate-click / sensor-chatter suppressor (and
    * the row-level complement of [[sessionize]]: same break predicate,
    * but surviving rows instead of session aggregates). Deterministic:
    * the within-key order is `(ts, tieCol)`, so replay and partitioning
    * cannot change which event leads a burst.
    *
    * Scale shape: ONE keyed window — the lag and the keep-filter share
    * the same `(key)` partitioning; nothing else exchanges.
    */
  def debounce(df: DataFrame, keyCols: Seq[String], tsCol: String,
               tieCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gap must be positive, got $gapSeconds")
    require(keyCols.nonEmpty, "debounce needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__tu"), col(tieCol))
    val gapUs = gapSeconds * 1000000L
    df.withColumn("__tu", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("__tu"), 1).over(w))
      .filter(col("__prev").isNull || col("__tu") - col("__prev") > gapUs)
      .drop("__prev")
      .withColumnRenamed("__tu", "ts_us")
      .drop(tsCol)
  }

  /** Recency-decayed activity score per key: `Σ value · 2^(−steps)`
    * with `steps = min(⌊Δdays / halfLifeDays⌋, 62)` against the
    * sample's max date — the freshness-weighted engagement number a
    * ranking/curation pass uses where a plain sum would let dead
    * accounts keep their score forever (stepped half-life form of
    * exponential decay).
    *
    * Exactness contract: the decay factor is a POWER OF TWO built by
    * bit-shift (`1 / (1L << steps)`) — an exactly representable double,
    * no `pow` (libm pow is not correctly rounded and differs across
    * engines); `value · weight` is one IEEE multiply; each term routes
    * through DECIMAL(18,9) before the per-key sum (the q67 recipe).
    * Steps cap at 62 (shift-safe; 2⁻⁶² is far below the decimal's
    * resolution anyway). Null/NaN values and null/epoch-garbage
    * timestamps are excluded.
    *
    * Scale shape: the anchor date is a 1-row aggregate broadcast back;
    * everything else is one map-side projection and one
    * partial-aggregating shuffle per key. No window, no collect.
    */
  def decayScore(df: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, halfLifeDays: Int = 7): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays must be positive, got $halfLifeDays")
    val base = df
      .filter(col(tsCol).isNotNull && year(col(tsCol)) =!= 1970 &&
        col(valueCol).isNotNull && !isnan(col(valueCol)))
      .select(col(keyCol), to_date(col(tsCol)).as("__d"),
        col(valueCol).cast("double").as("__v"))
    val anchor = base.agg(max(col("__d")).as("__maxd"))
    base.crossJoin(broadcast(anchor))
      .withColumn("__steps",
        least(floor(datediff(col("__maxd"), col("__d")).cast("double") /
          halfLifeDays).cast("long"), lit(62L)))
      .withColumn("__w",
        lit(1.0) / expr("shiftleft(1L, cast(__steps as int))").cast("double"))
      .withColumn("__term", (col("__v") * col("__w")).cast(DecimalType(18, 9)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        NumFunctions.roundNz(sum(col("__term")).cast("double"), 6)
          .as("decay_score"))
  }

  /** Per-key OLS linear trend of `valueCol` over the DAY index — the
    * "is this sensor drifting" scan for the reference's own telemetry
    * domain: slope in value-units-per-day from the closed-form
    * least-squares fit `(nΣxy − ΣxΣy)/(nΣx² − (Σx)²)`, with the mean
    * alongside. Complements [[Drift.w1Profile]] (distribution shift
    * between two loads) with a within-load direction and rate.
    *
    * Determinism: x is an integer day index anchored at the sample's
    * min date (1-row broadcast); Σx/Σx² are exact integer sums in
    * DECIMAL(28,0), Σy/Σxy route through DECIMAL(28,6) (the q73
    * correlation recipe), and the final slope is IEEE arithmetic over
    * those exact components in a pinned order. Keys observed on a
    * single day have no defined slope → null.
    *
    * Scale shape: one map-side projection + one partial-aggregating
    * shuffle per key. No window, no collect.
    */
  def trendSlope(df: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String): DataFrame = {
    val base = df
      .filter(col(tsCol).isNotNull && year(col(tsCol)) =!= 1970 &&
        col(valueCol).isNotNull && !isnan(col(valueCol)))
      .select(col(keyCol), to_date(col(tsCol)).as("__d"),
        col(valueCol).cast("double").as("__y"))
    val anchor = base.agg(min(col("__d")).as("__mind"))
    val x = datediff(col("__d"), col("__mind")).cast("long")
    val decSum = (c: Column, s: Int) => sum(c.cast(DecimalType(28, s))).cast("double")
    val g = base.crossJoin(broadcast(anchor))
      .select(col(keyCol), x.as("__x"), col("__y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        decSum(col("__x"), 0).as("__sx"),
        decSum(col("__y"), 6).as("__sy"),
        decSum(col("__x") * col("__x"), 0).as("__sxx"),
        decSum(col("__x") * col("__y"), 6).as("__sxy"))
    val den = col("n") * col("__sxx") - col("__sx") * col("__sx")
    g.select(col(keyCol), col("n"),
      NumFunctions.roundNz(
        when(den =!= 0.0,
          (col("n") * col("__sxy") - col("__sx") * col("__sy")) / den)
          .otherwise(lit(null)), 6).as("slope"),
      NumFunctions.roundNz(col("__sy") / col("n"), 6).as("mean_v"))
  }

  /** Subsequence similarity search: the `k` windows of length
    * `probe.length` (over the per-key sequence `idxCol` — 1-based,
    * dense) closest to `probe` by sum of squared differences — the
    * time-series analogue of the exact cosine top-k (find where a
    * pattern of interest recurs across all sensors/series). Returns
    * `(keyCol, start_idx, ssd_r)` ordered by (ssd, key, start) — a
    * total order, so the cut is deterministic.
    *
    * Determinism: each squared difference routes through
    * DECIMAL(38,12) before the per-window sum (the q67 recipe), so
    * any engine replays the ranking bit for bit.
    *
    * Scale design: the probe broadcasts as L rows and each series row
    * fans out to the ≤ L windows it participates in — a constant-L
    * row multiplier feeding ONE partial-aggregating (key, start)
    * shuffle, then the bounded TakeOrdered cut; no self-join of the
    * series against itself, no window over the sequence. L is the
    * pattern length (8–128 in practice) — cost is linear in rows × L
    * at any corpus size. For sub-linear candidate pruning at very
    * large L, quantize a PAA signature upstream and equi-join buckets
    * before this exact verify (the LSH-propose/exact-decide pattern
    * used across the dedup tier).
    */
  def ssdTopK(series: DataFrame, keyCol: String, idxCol: String,
              valueCol: String, probe: Array[Double], k: Int = 20): DataFrame = {
    require(probe.nonEmpty && probe.length <= 1024,
      s"probe length must be in [1, 1024], got ${probe.length}")
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = series.sparkSession
    import spark.implicits._
    val l = probe.length
    val p = broadcast(probe.toSeq.zipWithIndex
      .map { case (v, j) => (j.toLong, v) }.toDF("__j", "__pv"))
    val narrow = series
      .select(col(keyCol), col(idxCol).cast("long").as("__idx"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    // Fan-out memory budget for large probes: the probe join fans each
    // series row ×L into the (key, start) partial aggregate, and with
    // ARBITRARY input partitioning each window's L contributions
    // scatter across tasks — partial aggregation combines nothing, the
    // exchange carries rows × L, and per-task hash-agg state scales
    // with rows/task × L (the L = 64 stage that degraded under the
    // round-16 8 GiB driver heap). Range-partitioning the INPUT on
    // (key, idx) fixes both structurally: window (key, s)'s
    // contributions come from the contiguous idx run [s, s+L), so they
    // co-locate in one task, the partial aggregate collapses them to
    // ONE entry before the exchange (state ≈ windows/task, shuffle ≈
    // rows — measured 100 k vs 6.4 M exchange rows on the q189
    // fixture), and only boundary windows pay a merge. The partition
    // COUNT stays at the session's shuffle sizing — per-task fixed
    // costs (broadcast rebuild, codegen init) make an L-scaled task
    // inflation strictly slower (measured 5.0 s at ×8 vs 1.1 s at ×1).
    val spread =
      if (l > 8)
        narrow.repartitionByRange(
          spark.sessionState.conf.numShufflePartitions,
          col(keyCol), col("__idx"))
      else narrow
    val contrib = spread
      .join(p, col("__idx") - col("__j") >= 1)
      .select(col(keyCol), (col("__idx") - col("__j")).as("start_idx"),
        ((col("__v") - col("__pv")) * (col("__v") - col("__pv")))
          .cast(DecimalType(38, 12)).as("__t"))
    val ssd = contrib.groupBy(col(keyCol), col("start_idx"))
      .agg(sum(col("__t")).as("__ssd"), count(lit(1)).as("__n"))
      .filter(col("__n") === l) // complete windows only
      .select(col(keyCol), col("start_idx"),
        NumFunctions.roundNz(col("__ssd").cast("double"), 6).as("ssd_r"))
    ssd.orderBy(col("ssd_r").asc, col(keyCol).asc, col("start_idx").asc)
      .limit(k)
  }

  /** [[ssdTopK]] for LARGE probes: PAA lower-bound propose → exact
    * verify, returning the IDENTICAL top-k (same rows, same order) for
    * a fraction of the fan-out. A PRE-PROBE (one small aggregate, see
    * [[paaStructureRatio]]) routes noise-like data straight to the
    * exact path before any propose work is built — PAA prunes nothing
    * when segment means carry no variance, and detecting that only
    * after the propose pass means paying both paths. Then three phases:
    *
    *  1. PROPOSE: block-local prefix sums — the sequence blocks on
    *     `⌊(idx−1)/B⌋` (B ≥ L), each block's running sums come from a
    *     (key, block) window bounded by B rows, and each block joins
    *     its successor; a window spans ≤ 2 blocks, so every segment
    *     boundary's cumulative sum is an array lookup in the pair
    *     (the global carry cancels in the segment differences — no
    *     bucket-carry window, no per-key pass, tasks bounded by B at
    *     ANY key cardinality or series length). The lower bound
    *     `LB(w) = (L/S)·Σ_s (paa_w(s) − paa_probe(s))² ≤ SSD(w)`
    *     (Keogh et al.'s PAA lower-bounding lemma) costs O(rows · S)
    *     arithmetic — no row fan-out — versus the exact path's
    *     rows × L join rows (L/S = 32× fewer value touches at
    *     L = 512, S = 16; BASELINE.md `ssd_paa`).
    *  2. SEED: the `seedFactor·k` windows with smallest LB are scored
    *     exactly (windows are metadata-scale, so their rows re-enter
    *     through a broadcast range join); the k-th smallest exact SSD
    *     becomes the pruning threshold τ — correct for ANY seed set,
    *     the LB ordering just makes τ tight.
    *  3. VERIFY: only windows with `LB ≤ τ (+ fp slack)` are scored
    *     exactly (same DECIMAL(38,12) path, same complete-window
    *     filter, same total order). Every true top-k window satisfies
    *     `LB ≤ SSD ≤ τ`, so the cut loses nothing — TimeSeriesSpec
    *     pins PAA+verify ≡ exact. If the prune is ineffective — more
    *     than `maxCandidates` survivors, or more than a quarter of all
    *     windows (noise-like data gives PAA nothing to cut: every
    *     window's segment means hover near the global mean, so LB is
    *     tiny for all of them while exact SSDs are large for all of
    *     them) — the operator falls back to the exact path, whose
    *     single partial-aggregating shuffle beats re-entering rows
    *     for a candidate list that is most of the corpus.
    *
    * The candidate re-entry join buckets on (key, ⌊(idx−1)/L⌋): each
    * candidate window spans at most two L-blocks, so it enters the
    * broadcast hash join under ≤ 2 block keys and a series row meets
    * only the candidates overlapping its own block — without the
    * bucket, a low-cardinality key column (5 event types) would make
    * the equality join enumerate |rows| × |same-key candidates| pairs
    * before the range condition filtered them.
    *
    * The returned frame is a materialized LOCAL relation of ≤ k rows
    * (top-k is metadata by construction) — the operator's internal
    * caches are released before returning, so a lazy plan would
    * recompute the whole propose/verify pipeline on every downstream
    * action.
    *
    * Contract (inherited from [[ssdTopK]] and load-bearing here):
    * `idxCol` is 1-based and DENSE per key — prefix differences only
    * equal segment sums when every in-window position exists.
    */
  def ssdTopKPaa(series: DataFrame, keyCol: String, idxCol: String,
                 valueCol: String, probe: Array[Double], k: Int = 20,
                 segments: Int = 16, seedFactor: Int = 4,
                 maxCandidates: Long = 100000L): DataFrame = {
    val l = probe.length
    require(l <= 1024, s"probe length must be <= 1024, got $l")
    require(segments >= 1 && l % segments == 0,
      s"segments must divide the probe length, got $l / $segments")
    require(k >= 1 && seedFactor >= 1)
    val spark = series.sparkSession
    import spark.implicits._
    val segLen = l / segments
    val base = series
      .select(col(keyCol), col(idxCol).cast("long").as("__idx"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull && !isnan(col("__v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the ≤ k result rows materialize BEFORE the caches drop — a lazy
    // return would recompute the whole pipeline uncached downstream
    def finish(out: DataFrame): DataFrame = {
      val outRows = out.collect()
      val local = spark.createDataFrame(
        java.util.Arrays.asList(outRows: _*), out.schema)
      base.unpersist(blocking = false)
      local
    }
    // PRE-PROBE (one small partial aggregate — no row fan-out, no
    // window): route noise-like data straight to the exact path BEFORE
    // paying the propose pass. PAA's pruning power is exactly the share
    // of value variance the segment means carry: white noise puts
    // var(segment means) ≈ var(values)/segLen — normalized ratio ≈ 1 —
    // so every window's LB hovers near zero while exact SSDs are large,
    // and the old post-hoc guard detected that only AFTER the propose
    // windows/arrays were built, then re-ran the exact ×L fan-out on
    // top (pay-both-paths: 23–107 s under an 8 GiB heap, round-16
    // verdict). Structured series put most variance in the segment
    // means (a pure ramp scores segLen); 2.0 sits between noise's ≈ 1
    // (measured 0.81–0.97 on the q189 fixtures) and any series PAA can
    // actually cut. The post-hoc survivor guard stays as the backstop
    // for data the ratio misjudges — both paths are output-identical,
    // so routing is a pure performance decision.
    if (!(paaStructureRatio(base, keyCol, segLen) >= 2.0))
      return finish(ssdTopK(base, keyCol, "__idx", "__v", probe, k))
    // exact SSD for a SMALL (broadcastable) window set: re-enter each
    // window's rows via a broadcast range join, then the ssdTopK path
    def exactFor(cands: DataFrame): DataFrame = {
      // bucket on the L-block so the broadcast hash join keys on
      // (key, block) — a candidate window [cs, cs+L) overlaps at most
      // two blocks, so it enters under ≤ 2 keys and each series row
      // meets only block-local candidates (not every same-key one)
      val c = broadcast(cands.select(col(keyCol).as("__ck"),
          col("start_idx").as("__cs"))
        .withColumn("__cblk", explode(array_distinct(array(
          floor((col("__cs") - 1) / l),
          floor((col("__cs") + l - 2) / l))))))
      val p = broadcast(probe.toSeq.zipWithIndex
        .map { case (v, j) => (j.toLong, v) }.toDF("__j", "__pv"))
      base.withColumn("__blk", floor((col("__idx") - 1) / l))
        .join(c, col(keyCol) === col("__ck") && col("__blk") === col("__cblk") &&
          col("__idx") >= col("__cs") && col("__idx") < col("__cs") + l)
        .join(p, col("__idx") - col("__cs") === col("__j"))
        .select(col(keyCol), col("__cs").as("start_idx"),
          ((col("__v") - col("__pv")) * (col("__v") - col("__pv")))
            .cast(DecimalType(38, 12)).as("__t"))
        .groupBy(col(keyCol), col("start_idx"))
        .agg(sum(col("__t")).as("__ssd"), count(lit(1)).as("__n"))
        .filter(col("__n") === l)
        .select(col(keyCol), col("start_idx"),
          NumFunctions.roundNz(col("__ssd").cast("double"), 6).as("ssd_r"))
    }
    // phase 1 (PROPOSE): per-window PAA lower bounds with NO per-key
    // pass anywhere — a `Window.partitionBy(key)` prefix sum would
    // serialize each key's whole stream through one task (fatal for
    // few-hot-key series: exactly q189's 5 event types). Instead the
    // sequence blocks on __b = ⌊(idx−1)/B⌋ with B ≥ L: block-LOCAL
    // prefix sums come from a (key, block) window bounded by B rows,
    // each block joins its successor, and since a window [start,
    // start+L) spans at most TWO blocks, every segment boundary's
    // cumulative sum is an array lookup in the pair. Block-local cums
    // difference exactly like global ones — the global carry CANCELS
    // in c_s − c_{s−1}; only the cross-block step adds the block
    // total, which rides as a column. No bucket-carry window over
    // block totals is needed at all, so no phase is serial in a hot
    // key's length: tasks are bounded by B at any key cardinality.
    // The LB arithmetic per start is still O(S) lookups, computed
    // inside a transform() over the block array so the pair arrays
    // never replicate per exploded row.
    val probePaa = probe.grouped(segLen).map(s => s.sum / segLen).toSeq
    val bSize = math.max(l, 1024).toLong
    val withB = base.withColumn("__b",
      (((col("__idx") - 1) - pmod(col("__idx") - 1, lit(bSize))) / bSize)
        .cast("long"))
    val wb = Window.partitionBy(col(keyCol), col("__b")).orderBy(col("__idx"))
    // one primitive double array per block: __arr(p) = Σ v over the
    // block's first p values (inclusive block-local cum at position p)
    val blocks = withB
      .withColumn("__bc", sum(col("__v")).over(
        wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__b"))
      .agg(transform(sort_array(collect_list(struct(col("__idx"),
        col("__bc")))), e => e.getField("__bc")).as("__arr"))
    val nxt = blocks.select(col(keyCol).as("__k2"),
      (col("__b") - 1).as("__b2"), col("__arr").as("__arr2"))
    val joined = blocks.join(nxt,
      col(keyCol) === col("__k2") && col("__b") === col("__b2"), "left")
    // a block needing cross-block lookups is necessarily FULL (blocks
    // are dense, only the last block of a key is short and it has no
    // successor), so its total is element B of its own cum array; the
    // try_ guard keeps the short-tail case null-propagating instead of
    // ANSI-throwing on the dead branch
    val bTot = try_element_at(col("__arr"), lit(bSize.toInt))
    val lbStructs = transform(sequence(lit(1), size(col("__arr"))), p => {
      // inclusive block-local cum at in-block position tp = p−1+s·S:
      // in this block's array when tp ≤ B (a tail block shorter than
      // B yields null via try_element_at, which IS the incomplete-
      // window filter — as is a missing successor, arr2 = null), else
      // this block's total plus the successor's local cum
      def cAt(s: Int): Column = {
        val tp = p - 1 + s * segLen
        when(tp <= bSize, try_element_at(col("__arr"), tp.cast("int")))
          .otherwise(bTot +
            try_element_at(col("__arr2"), (tp - bSize).cast("int")))
      }
      val cs = (0 to segments).map(s =>
        if (s == 0) when(p === 1, lit(0.0))
          .otherwise(element_at(col("__arr"), (p - 1).cast("int")))
        else cAt(s))
      val lb = (1 to segments).map { s =>
        val d = (cs(s) - cs(s - 1)) / segLen - lit(probePaa(s - 1))
        d * d
      }.reduce(_ + _) * segLen
      struct((col("__b") * bSize + p).as("start_idx"), lb.as("lb"))
    })
    val lbTbl = joined
      .select(col(keyCol), explode(lbStructs).as("__e"))
      .select(col(keyCol), col("__e.start_idx").as("start_idx"),
        col("__e.lb").as("__lb"))
      .filter(col("__lb").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase 2: exact-score the best-LB seeds, τ = k-th smallest
    val seeds = lbTbl.orderBy(col("__lb").asc, col(keyCol).asc,
        col("start_idx").asc)
      .limit(k * seedFactor).select(col(keyCol), col("start_idx"))
    val seedSsd = exactFor(seeds)
      .orderBy(col("ssd_r").asc, col(keyCol).asc, col("start_idx").asc)
      .limit(k).select(col("ssd_r")).as[Double].collect()
    // the cached base already carries the normalized (key, idx, value)
    // columns — the fallback reuses it instead of recomputing `series`
    def exactFallback(): DataFrame =
      ssdTopK(base, keyCol, "__idx", "__v", probe, k)
    val out = if (seedSsd.length < k) {
      // fewer complete windows than k among seeds: don't prune, the
      // exact path is already ~candidate-scale
      exactFallback()
    } else {
      val tau = seedSsd.last
      // fp slack: LB is double prefix arithmetic vs the exact DECIMAL
      // path, and τ is rounded to 6 dp — relax by a hair, never tighten
      val survivors = lbTbl
        .filter(col("__lb") <= lit(tau) * (1 + 1e-9) + lit(1e-6))
        .select(col(keyCol), col("start_idx"))
      val totalWindows = lbTbl.count()
      val nSurv = survivors.count()
      // prune must EARN the candidate re-entry joins: on noise-like
      // data PAA cuts nothing (all LBs tiny, all SSDs large) and
      // re-entering ~every window costs more than the exact path's
      // one partial-aggregating shuffle
      if (nSurv > maxCandidates || nSurv * 4L > totalWindows)
        exactFallback()
      else
        exactFor(survivors)
          .orderBy(col("ssd_r").asc, col(keyCol).asc, col("start_idx").asc)
          .limit(k)
    }
    val local = finish(out)
    lbTbl.unpersist(blocking = false)
    local
  }

  /** [[ssdTopKPaa]]'s routing statistic: the share of value variance the
    * `segLen`-point segment means carry, normalized so white noise ≈ 1
    * and a pure ramp = segLen — `var(segment means) · segLen /
    * var(values)`, pooled over complete segments of every key. One
    * partial-aggregating pass (map-side combine on (key, segment), then
    * a scalar fold); complete segments only, so short tails can't bias
    * the means. Returns 0 when fewer than 2 complete segments exist or
    * the series is constant — both route to the exact path, where
    * pruning has nothing to offer. Exposed `private[graft]` so
    * TimeSeriesSpec can pin the router's decision on both fixture
    * families.
    */
  private[graft] def paaStructureRatio(base: DataFrame, keyCol: String,
                                       segLen: Int): Double = {
    val seg = base
      .groupBy(col(keyCol), floor((col("__idx") - 1) / segLen).as("__sg"))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("s1"),
        sum(col("__v") * col("__v")).as("s2"))
      .filter(col("n") === segLen)
    val r = seg.agg(count(lit(1)).as("m"), sum(col("s1")).as("t1"),
      sum(col("s2")).as("t2"), sum(col("s1") * col("s1")).as("q1")).head()
    if (r.isNullAt(0) || r.getLong(0) < 2) return 0.0
    val m = r.getLong(0).toDouble
    val n = m * segLen
    val mean = r.getDouble(1) / n
    val varTot = r.getDouble(2) / n - mean * mean
    val varSeg = r.getDouble(3) / (m * segLen * segLen) - mean * mean
    if (varTot <= 0) 0.0 else varSeg * segLen / varTot
  }

  def rollingZscore(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, win: Int = 7,
                    threshold: Double = 2.0): DataFrame = {
    require(win >= 2, s"window must cover at least 2 days, got $win")
    val daily = dailySeries(df, keyCol, tsCol, valueCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("d"))
      .rowsBetween(-(win - 1), Window.currentRow)
    val n = count(col("v")).over(w)
    val s1 = sum(col("v").cast(DecimalType(18, 2))).over(w).cast("double")
    val s2 = sum((col("v") * col("v")).cast(DecimalType(28, 6))).over(w).cast("double")
    val mean = s1 / n
    val variance = (s2 - s1 * s1 / n) / (n - 1)
    val z = when(n >= 2 && variance > 0,
      NumFunctions.roundNz((col("v") - mean) / sqrt(variance), 6))
    daily.select(col(keyCol),
        date_format(col("d"), "yyyy-MM-dd").as("day"), col("v"),
        z.as("zscore"))
      .withColumn("is_anomaly", coalesce(abs(col("zscore")) > threshold, lit(false)))
  }
}
