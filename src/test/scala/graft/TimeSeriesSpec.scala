package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

/** [[graft.operators.TimeSeries]] — per-key daily series, grid
  * gap-filling, rolling z-score. Crafted fixtures pin the fill
  * semantics and the variance arithmetic.
  */
class TimeSeriesSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private val series = Seq(
    // key "a": days 1 (two rows, sums to 3.0), 2, then a 2-day gap, then 5
    (1L, ts(1, 1), "a", 1.0), (2L, ts(1, 9), "a", 2.0),
    (3L, ts(2), "a", 10.0), (4L, ts(5), "a", 4.0),
    // key "b": single day — a 1-row grid, no gaps
    (5L, ts(3), "b", 7.5)
  ).toDF("event_id", "ts", "key", "value")

  test("gapFillDaily: per-key span, forward-filled gaps, intra-day sums") {
    val got = TimeSeries.gapFillDaily(series, "key", "ts", "value")
      .as[(String, String, Double, Boolean)].collect().sorted.toSeq
    assert(got === Seq(
      ("a", "2024-01-01", 3.0, false),  // 1.0 + 2.0 summed within the day
      ("a", "2024-01-02", 10.0, false),
      ("a", "2024-01-03", 10.0, true),  // gap carries last observation
      ("a", "2024-01-04", 10.0, true),
      ("a", "2024-01-05", 4.0, false),
      ("b", "2024-01-03", 7.5, false))) // b's grid is ITS OWN span, not a's
  }

  test("sessionize: splits exactly at the gap boundary, per-key ordinals and spans") {
    def t(min: Int, sec: Int = 0): Timestamp =
      Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")
    // key "a": events at 0, 10, 20 min (one session: every gap = 600 s);
    // then 50:01 (> 1800 s after 20:00 → new session), then 51:00.
    // key "b": single event = single 1-event session with zero span.
    val df = Seq(
      (1L, t(0), "a", 0.0), (2L, t(10), "a", 0.0), (3L, t(20), "a", 0.0),
      (4L, t(50, 1), "a", 0.0), (5L, t(51), "a", 0.0),
      (6L, t(5), "b", 0.0)
    ).toDF("event_id", "ts", "key", "value")
    val got = TimeSeries.sessionize(df, "key", "ts", "event_id", gapSeconds = 1800)
      .as[(String, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    def us(min: Int, sec: Int = 0): Long =
      (Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d").getTime) * 1000L
    assert(got === Seq(
      ("a", 1L, us(0), us(20), 3L, us(20) - us(0)),
      ("a", 2L, us(50, 1), us(51), 2L, us(51) - us(50, 1)),
      ("b", 1L, us(5), us(5), 1L, 0L)))
  }

  test("sessionize: a gap of exactly gapSeconds does NOT split (strict >)") {
    def t(sec: Int): Timestamp = new Timestamp(1704067200000L + sec * 1000L)
    val df = Seq((1L, t(0), "k", 0.0), (2L, t(1800), "k", 0.0),
      (3L, t(3601), "k", 0.0)) // 1800 s holds, 1801 s breaks
      .toDF("event_id", "ts", "key", "value")
    val got = TimeSeries.sessionize(df, "key", "ts", "event_id", gapSeconds = 1800)
      .select("session", "n_events").as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 2L), (2L, 1L)))
  }

  test("ssdTopK: hand-computed distances; self-match is 0; incomplete windows excluded") {
    // series a = [1, 2, 3, 4, 5]; b = [2, 3, 4, 9]; probe [2, 3, 4]
    val series = (Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 5.0))
      .map { case (i, v) => ("a", i, v) } ++
      Seq((1L, 2.0), (2L, 3.0), (3L, 4.0), (4L, 9.0))
        .map { case (i, v) => ("b", i, v) })
      .toDF("key", "idx", "v")
    val got = graft.operators.TimeSeries.ssdTopK(series, "key", "idx", "v",
        Array(2.0, 3.0, 4.0), k = 10)
      .as[(String, Long, Double)].collect().toSeq
    // windows: a@1=[1,2,3]→3, a@2=[2,3,4]→0, a@3=[3,4,5]→3,
    //          b@1=[2,3,4]→0, b@2=[3,4,9]→27; a@4/b@3 incomplete → absent
    assert(got === Seq(("a", 2L, 0.0), ("b", 1L, 0.0),
      ("a", 1L, 3.0), ("a", 3L, 3.0), ("b", 2L, 27.0)))
  }

  test("ssdTopK: k cuts on the (ssd, key, start) total order; NaN rows dropped") {
    val series = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, Double.NaN),
      ("b", 1L, 5.0), ("b", 2L, 5.0)).toDF("key", "idx", "v")
    val got = graft.operators.TimeSeries.ssdTopK(series, "key", "idx", "v",
        Array(5.0, 5.0), k = 1)
      .as[(String, Long, Double)].collect().toSeq
    // both complete windows tie at 0; key "a" wins the tie-break
    assert(got === Seq(("a", 1L, 0.0)))
  }

  test("ssdTopKPaa: propose+verify returns the exact path's rows in the exact order (L=64)") {
    // 6 keys × 200 dense points, deterministic pseudo-values with
    // planted near-matches of the probe at known offsets; L = 64,
    // S = 16 → 4-point segments. The 0.15·i ramp component puts enough
    // variance in the segment means (structure ratio ≈ 3.6 > 2) that
    // the pre-probe routes THIS fixture through the propose path — the
    // identity assertion below covers propose/seed/τ-prune, not the
    // exact fallback
    def v(key: Int, i: Int): Double =
      ((i * 37 + key * 101) % 97) / 9.7 + (if (i % 13 == 0) 3.0 else 0.0) +
        i * 0.15
    val probe = Array.tabulate(64)(j => v(2, j + 50)) // key 2's window @50
    val rows = for (key <- 0 until 6; i <- 1 to 200)
      yield (s"k$key", i.toLong, v(key, i))
    val series = rows.toDF("key", "idx", "v")
    val exact = graft.operators.TimeSeries.ssdTopK(
      series, "key", "idx", "v", probe, k = 25)
      .as[(String, Long, Double)].collect().toSeq
    val paa = graft.operators.TimeSeries.ssdTopKPaa(
      series, "key", "idx", "v", probe, k = 25, segments = 16)
      .as[(String, Long, Double)].collect().toSeq
    assert(paa === exact, "PAA propose/verify must reproduce the exact top-k bit-for-bit")
    // the planted self-match surfaces at distance 0 (the periodic
    // fixture admits other exact matches; ties break by key)
    assert(exact.contains(("k2", 50L, 0.0)))
    assert(exact.head._3 === 0.0)
  }

  test("ssdTopKPaa: degenerate corpora (fewer windows than k, ties) fall back losslessly") {
    val series = (1 to 40).map(i => ("only", i.toLong, (i % 5).toDouble))
      .toDF("key", "idx", "v")
    val probe = Array.tabulate(8)(j => ((j + 1) % 5).toDouble)
    val exact = graft.operators.TimeSeries.ssdTopK(
      series, "key", "idx", "v", probe, k = 50)
      .as[(String, Long, Double)].collect().toSeq
    val paa = graft.operators.TimeSeries.ssdTopKPaa(
      series, "key", "idx", "v", probe, k = 50, segments = 4)
      .as[(String, Long, Double)].collect().toSeq
    assert(paa === exact)
  }

  test("ssdTopKPaa: ONE hot key spanning many blocks — cross-block lookups exact, prune path taken") {
    // 1 key × 1200 dense points with B = 256 → 5 blocks: every window
    // whose start sits in a block's last L−1 positions resolves its
    // later segment boundaries through the SUCCESSOR block's array
    // (the __bsum + __arr2 branch), and the probe is planted at
    // idx 601 so the best window itself straddles blocks 2 and 3.
    // The ramp makes PAA prune hard (segment means grow away from the
    // probe), so this exercises the propose path, not the fallback —
    // and the single hot key is exactly the regime where the old
    // per-key window pass was serial.
    def v(i: Int): Double = i * 0.1 + (i % 7) * 0.01
    val series = (1 to 1200).map(i => ("hot", i.toLong, v(i)))
      .toDF("key", "idx", "v").repartition(8)
    val probe = Array.tabulate(64)(j => v(601 + j))
    val exact = graft.operators.TimeSeries.ssdTopK(
      series, "key", "idx", "v", probe, k = 12)
      .as[(String, Long, Double)].collect().toSeq
    val paa = graft.operators.TimeSeries.ssdTopKPaa(
      series, "key", "idx", "v", probe, k = 12, segments = 16)
      .as[(String, Long, Double)].collect().toSeq
    assert(paa === exact)
    assert(exact.head === (("hot", 601L, 0.0)))
  }

  test("ssdTopKPaa: noise collapse (LB prunes nothing) takes the exact fallback losslessly") {
    // hash-noise values: every window's segment means sit near the
    // global mean, so the PAA lower bound is tiny for ALL windows
    // while exact SSDs are large for all — survivors exceed a quarter
    // of the windows and the operator must fall back to the exact
    // single-shuffle path instead of re-entering ~the whole corpus
    def noise(key: Int, i: Int): Double = ((i * 2654435761L + key * 40503L) % 997L) / 99.7
    val rows = for (key <- 0 until 3; i <- 1 to 300)
      yield (s"k$key", i.toLong, noise(key, i))
    val series = rows.toDF("key", "idx", "v")
    val probe = Array.tabulate(32)(j => noise(1, j + 40))
    val exact = graft.operators.TimeSeries.ssdTopK(
      series, "key", "idx", "v", probe, k = 10)
      .as[(String, Long, Double)].collect().toSeq
    val paa = graft.operators.TimeSeries.ssdTopKPaa(
      series, "key", "idx", "v", probe, k = 10, segments = 8)
      .as[(String, Long, Double)].collect().toSeq
    assert(paa === exact)
    // the planted self-window surfaces at distance 0 (the modular
    // fixture admits other exact matches; ties break by key)
    assert(exact.contains(("k1", 40L, 0.0)))
    assert(exact.head._3 === 0.0)
  }

  test("paaStructureRatio: the pre-probe router separates noise from structure") {
    import org.apache.spark.sql.functions.col
    def norm(df: org.apache.spark.sql.DataFrame) = df.select(col("key"),
      col("idx").cast("long").as("__idx"), col("v").cast("double").as("__v"))
    // white-noise-like values: segment means carry ~1/segLen of the
    // variance → normalized ratio ≈ 1, routed to the exact path (the
    // q189 driver fixture measures 0.81–0.97 at sf0.001/sf0.01)
    def noise(key: Int, i: Int): Double = {
      // xor-shift mix — a raw multiplicative congruence mod 997 yields
      // sawtooth ramps (arithmetic steps), which HAVE segment structure
      val x0 = (i * 31 + key * 17).toLong * 2654435761L
      val x = x0 ^ (x0 >>> 16)
      Math.floorMod(x, 997L) / 99.7
    }
    val noisy = (for (k <- 0 until 3; i <- 1 to 400)
      yield (s"k$k", i.toLong, noise(k, i))).toDF("key", "idx", "v")
    val rNoise = graft.operators.TimeSeries.paaStructureRatio(
      norm(noisy), "key", segLen = 8)
    assert(rNoise < 2.0, s"noise must route exact, ratio = $rNoise")
    // ramp: segment means carry ~all the variance → ratio ≈ segLen,
    // routed through the propose path
    val ramp = (1 to 400).map(i => ("hot", i.toLong, i * 0.1))
      .toDF("key", "idx", "v")
    val rRamp = graft.operators.TimeSeries.paaStructureRatio(
      norm(ramp), "key", segLen = 8)
    assert(rRamp >= 2.0, s"ramp must route through propose, ratio = $rRamp")
    // degenerate guards: constant series and sub-2-segment corpora
    // report 0 (exact path — pruning has nothing to offer)
    val const = (1 to 64).map(i => ("c", i.toLong, 5.0)).toDF("key", "idx", "v")
    assert(graft.operators.TimeSeries.paaStructureRatio(
      norm(const), "key", segLen = 8) === 0.0)
    val tiny = (1 to 9).map(i => ("t", i.toLong, i * 1.0)).toDF("key", "idx", "v")
    assert(graft.operators.TimeSeries.paaStructureRatio(
      norm(tiny), "key", segLen = 8) === 0.0)
  }

  test("rollingZscore: trailing-window mean/std arithmetic, leading rows unscored") {
    // key with daily values 1,2,3,4 and win=3:
    // day1: n=1 → null; day2: n=2, mean 1.5, var 0.5; day3: n=3 over {1,2,3}
    val df = Seq((1L, ts(1), "k", 1.0), (2L, ts(2), "k", 2.0),
      (3L, ts(3), "k", 3.0), (4L, ts(4), "k", 4.0))
      .toDF("event_id", "ts", "key", "value")
    val got = TimeSeries.rollingZscore(df, "key", "ts", "value", win = 3)
      .select(col("day"), col("zscore"), col("is_anomaly"))
      .as[(String, Option[Double], Boolean)].collect().sortBy(_._1).toSeq
    def z(v: Double, xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
      (math.round((v - m) / sd * 1e6)) / 1e6.toDouble
    }
    assert(got === Seq(
      ("2024-01-01", None, false),
      ("2024-01-02", Some(z(2, Seq(1, 2))), false),
      ("2024-01-03", Some(z(3, Seq(1, 2, 3))), false),
      ("2024-01-04", Some(z(4, Seq(2, 3, 4))), false)))
  }

  test("rollingZscore: constant series has zero variance and stays unscored, never NaN") {
    val df = (1 to 5).map(i => (i.toLong, ts(i), "k", 3.0))
      .toDF("event_id", "ts", "key", "value")
    val got = TimeSeries.rollingZscore(df, "key", "ts", "value", win = 3)
      .select(col("zscore"), col("is_anomaly"))
      .as[(Option[Double], Boolean)].collect().toSeq
    assert(got.forall { case (zs, flag) => zs.isEmpty && !flag })
  }

  test("edge: empty input yields empty output; single-day key yields a 1-row grid") {
    val empty = series.limit(0)
    assert(TimeSeries.gapFillDaily(empty, "key", "ts", "value").count() === 0)
    assert(TimeSeries.rollingZscore(empty, "key", "ts", "value").count() === 0)
    val one = Seq((1L, ts(7), "solo", 2.5)).toDF("event_id", "ts", "key", "value")
    val g = TimeSeries.gapFillDaily(one, "key", "ts", "value")
      .as[(String, String, Double, Boolean)].collect().toSeq
    assert(g === Seq(("solo", "2024-01-07", 2.5, false)))
  }

  test("edge: null ts/value rows do not crash and do not contribute to day sums") {
    val df = Seq(
      (1L, Option(ts(1)), "k", Option(1.0)),
      (2L, None: Option[Timestamp], "k", Option(9.0)),   // null day → its own group, harmless
      (3L, Option(ts(1)), "k", None: Option[Double]))    // null value → sum ignores
      .toDF("event_id", "ts", "key", "value")
    val got = TimeSeries.gapFillDaily(df.filter(col("ts").isNotNull), "key", "ts", "value")
      .as[(String, String, Double, Boolean)].collect().toSeq
    assert(got === Seq(("k", "2024-01-01", 1.0, false)))
  }

  test("gapFillDaily is partitioning-invariant (exact decimal day sums)") {
    val a = TimeSeries.gapFillDaily(series, "key", "ts", "value")
      .as[(String, String, Double, Boolean)].collect().sorted.toSeq
    val b = TimeSeries.gapFillDaily(series.repartition(11), "key", "ts", "value")
      .as[(String, String, Double, Boolean)].collect().sorted.toSeq
    assert(a === b)
  }

  test("journeys: sessions split by gap, sequences ordered by (ts, tie), counted and cut") {
    def t(s: String) = Timestamp.valueOf(s)
    // u1 session 1: A>B ; u1 session 2 (gap > 10 min): A>B ; u2: A>B ;
    // u3: C alone — "A>B" dominates with 3 sessions
    val df = Seq(
      (1L, 1L, "A", t("2024-01-01 10:00:00")),
      (2L, 1L, "B", t("2024-01-01 10:01:00")),
      (3L, 1L, "A", t("2024-01-01 12:00:00")),
      (4L, 1L, "B", t("2024-01-01 12:02:00")),
      (5L, 2L, "A", t("2024-01-01 09:00:00")),
      (6L, 2L, "B", t("2024-01-01 09:03:00")),
      (7L, 3L, "C", t("2024-01-01 08:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = TimeSeries.journeys(df, "user_id", "ts", "event_id",
        "event_type", gapSeconds = 600L, k = 5)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("A>B", 3L), ("C", 1L)))
    // equal timestamps order by the tie column inside the sequence
    val tie = Seq(
      (9L, 9L, "X", t("2024-01-01 00:00:00")),
      (8L, 9L, "Y", t("2024-01-01 00:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val seq1 = TimeSeries.journeys(tie, "user_id", "ts", "event_id",
        "event_type", gapSeconds = 60L, k = 1)
      .as[(String, Long)].collect().head
    assert(seq1 === (("Y>X", 1L)))
  }

  test("debounce: chained bursts keep only their leader, keys independent") {
    def t(s: String) = Timestamp.valueOf(s)
    // key u1: events at 0s, 3s, 6s (chained, gap 5s) then 100s — the
    // 3s and 6s rows chain off the leader even though 6s is >5s from 0s
    val df = Seq(
      (1L, 10L, "click", t("2024-01-01 00:00:00")),
      (2L, 10L, "click", t("2024-01-01 00:00:03")),
      (3L, 10L, "click", t("2024-01-01 00:00:06")),
      (4L, 10L, "click", t("2024-01-01 00:01:40")),
      (5L, 10L, "view",  t("2024-01-01 00:00:01")), // other key: own leader
      (6L, 11L, "click", t("2024-01-01 00:00:02"))  // other user: own leader
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = TimeSeries.debounce(df, Seq("user_id", "event_type"),
        "ts", "event_id", gapSeconds = 5L)
      .select("event_id").as[Long].collect().toSet
    assert(got === Set(1L, 4L, 5L, 6L))
  }

  test("debounce: equal timestamps break by the tie column — exactly one survivor") {
    def t(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (7L, 1L, "x", t("2024-01-01 00:00:00")),
      (2L, 1L, "x", t("2024-01-01 00:00:00")),
      (9L, 1L, "x", t("2024-01-01 00:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = TimeSeries.debounce(df, Seq("user_id", "event_type"),
        "ts", "event_id", gapSeconds = 60L)
      .select("event_id").as[Long].collect().toSeq
    assert(got === Seq(2L), s"lowest event_id must lead the burst: $got")
  }

  test("decayScore: hand-computed stepped half-life weights (exact powers of two)") {
    def day(d: String) = Timestamp.valueOf(s"$d 12:00:00")
    val df = Seq(
      (1L, day("2024-03-29"), 8.0),   // Δ=0 days → steps 0 → w=1
      (1L, day("2024-03-22"), 8.0),   // Δ=7  → steps 1 → w=1/2
      (1L, day("2024-03-14"), 8.0),   // Δ=15 → steps 2 → w=1/4
      (2L, day("2024-03-29"), 3.5),   // steps 0
      (2L, day("1970-01-01"), 99.0),  // epoch garbage: excluded
      (3L, day("2024-03-28"), Double.NaN) // NaN: excluded → user 3 absent
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.decayScore(df, "user_id", "ts", "value", 7)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got === Map(
      1L -> ((3L, 8.0 + 4.0 + 2.0)),
      2L -> ((1L, 3.5))))
  }

  test("decayScore: steps cap at 62 — ancient events score ~0, never a shift overflow") {
    def day(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val df = Seq(
      (1L, day("2024-03-29"), 1.0),
      (1L, day("1994-01-01"), 1000000.0)  // ~30 years ago at halfLife=1
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.decayScore(df, "user_id", "ts", "value", 1)
      .as[(Long, Long, Double)].collect().head
    assert(got === ((1L, 2L, 1.0)), s"2^-62 term must vanish at 6 decimals: $got")
  }

  test("trendSlope: exact OLS slope on a hand-built ramp; single-day key is null") {
    def day(d: String) = Timestamp.valueOf(s"$d 10:00:00")
    val df = Seq(
      // key "up": y = 2x + 1 over days 0..3 → slope exactly 2, mean 4
      ("up", day("2024-01-01"), 1.0), ("up", day("2024-01-02"), 3.0),
      ("up", day("2024-01-03"), 5.0), ("up", day("2024-01-04"), 7.0),
      // key "flat": constant → slope 0
      ("flat", day("2024-01-01"), 5.0), ("flat", day("2024-01-03"), 5.0),
      // key "one": a single day (two rows, same x) → denominator 0 → null
      ("one", day("2024-01-02"), 1.0), ("one", day("2024-01-02"), 9.0)
    ).toDF("k", "ts", "value")
    val got = TimeSeries.trendSlope(df, "k", "ts", "value")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getDouble(3)))).toMap
    assert(got("up") === ((4L, Some(2.0), 4.0)))
    assert(got("flat") === ((2L, Some(0.0), 5.0)))
    assert(got("one") === ((2L, None, 5.0)))
  }

  test("decayScore: plan is map-side + one keyed aggregate (no window, anchor broadcasts)") {
    def day(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val df = (1 to 50).map(i => (i.toLong % 5, day("2024-03-01"), i.toDouble))
      .toDF("user_id", "ts", "value")
    val plan = TimeSeries.decayScore(df, "user_id", "ts", "value", 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window in the decay plan:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the anchor date must broadcast:\n$plan")
  }
}
