package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantiles

/** [[graft.operators.Quantiles.quantileScan]] — exact distributed
  * selection: equality with `percentile` (the buffering implementation
  * it replaces at scale) on the fixture and on adversarial shapes —
  * heavy duplicate mass (unsplittable regions), even/odd interpolation,
  * and tiny-terminal parameters that force many bisection rounds.
  */
class QuantilesSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  // compare at 6 decimals — the engine's output contract; Spark's
  // percentile evaluates v1·(1−f)+v2·f where quantileScan (like DuckDB
  // quantile_cont) evaluates v1+(v2−v1)·f, equal to the last ulp only
  private def r6(v: Double) =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def reference(df: org.apache.spark.sql.DataFrame, p: Double) =
    df.groupBy(col("g")).agg(expr(s"percentile(v, $p)").as("q"))
      .as[(String, Double)].collect().toMap
      .view.mapValues(r6).toMap

  test("quantileScan == percentile on the events fixture, several p, forced multi-round") {
    val ev = Tables.events(spark, sf0001).filter(col("value").isNotNull)
      .select(col("event_type").as("g"), col("value").as("v"))
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val want = reference(ev, p)
      val got = Quantiles.quantileScan(ev, "g", "v", p, bins = 8, collectLimit = 16)
        .select(col("g"), col("q")).as[(String, Double)].collect().toMap
        .view.mapValues(r6).toMap
      assert(got === want, s"p=$p")
    }
  }

  test("quantileScan: heavy duplicate mass resolves through the unsplittable-region path") {
    // 10k copies of 5.0 swamp any collectLimit; the median region
    // degenerates to [5,5] and must resolve WITHOUT collecting rows
    val d = ((1 to 10000).map(_ => ("a", 5.0)) ++ Seq(("a", 1.0), ("a", 9.0)))
      .toDF("g", "v")
    val got = Quantiles.quantileScan(d, "g", "v", 0.5, bins = 4, collectLimit = 4)
      .select(col("q")).as[Double].collect().head
    assert(got === 5.0)
  }

  test("quantileScan: interpolation matches percentile on even counts") {
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 10.0), ("a", 20.0),
      ("b", 3.0), ("b", 4.0)).toDF("g", "v")
    for (p <- Seq(0.5, 0.3, 0.75)) {
      val want = reference(d, p)
      val got = Quantiles.quantileScan(d, "g", "v", p, bins = 4, collectLimit = 2)
        .select(col("g"), col("q")).as[(String, Double)].collect().toMap
        .view.mapValues(r6).toMap
      assert(got === want, s"p=$p")
    }
  }

  test("quantileScan: single-value and single-row groups") {
    val d = Seq(("a", 7.0), ("b", 1.0), ("b", 1.0), ("b", 1.0)).toDF("g", "v")
    val got = Quantiles.quantileScan(d, "g", "v", 0.5)
      .select(col("g"), col("n"), col("q"))
      .as[(String, Long, Double)].collect().toSet
    assert(got === Set(("a", 1L, 7.0), ("b", 3L, 1.0)))
  }

  test("quantileScanMulti: p01/p50/p99 family matches per-p percentile, shared passes") {
    val ev = Tables.events(spark, sf0001).filter(col("value").isNotNull)
      .select(col("event_type").as("g"), col("value").as("v"))
    val ps = Seq(0.01, 0.5, 0.99)
    val got = Quantiles.quantileScanMulti(ev, "g", "v", ps,
        bins = 8, collectLimit = 16)
      .select(col("g"), col("p"), col("q"))
      .as[(String, Double, Double)].collect()
      .map { case (g, p, q) => (g, p) -> r6(q) }.toMap
    for (p <- ps; (g, want) <- reference(ev, p))
      assert(got((g, p)) === want, s"g=$g p=$p")
    // one result row per (group, p)
    assert(got.size === ps.size * reference(ev, 0.5).size)
  }

  test("quantileScanMulti: NaN values are excluded like nulls") {
    val d = Seq(("a", 1.0), ("a", Double.NaN), ("a", 3.0)).toDF("g", "v")
    val got = Quantiles.quantileScanMulti(d, "g", "v", Seq(0.5))
      .select(col("n"), col("q")).as[(Long, Double)].collect().head
    assert(got === ((2L, 2.0)))
  }

  test("10k groups: bounds ride a broadcast JOIN (no plan literal), results exact") {
    // 10k groups x 31 rows — the cardinality regime where a plan-embedded
    // group->bounds map literal would bloat the plan; the bounds must
    // arrive via a broadcast hash join instead
    val d = sp.range(310000).select(
      concat(lit("g"), (col("id") % 10000)).as("g"),
      (col("id") % 31).cast("double").as("v"))
    val want = reference(d, 0.5)
    val got = Quantiles.quantileScan(d, "g", "v", 0.5)
      .select(col("g"), col("q")).as[(String, Double)].collect().toMap
      .view.mapValues(r6).toMap
    assert(got === want)
    assert(Quantiles.lastRoundPlan.contains("BroadcastHashJoin"),
      s"bounds join was not broadcast:\n${Quantiles.lastRoundPlan.take(2000)}")
  }

  test("winsorize useScan path equals the percentile path (q84 shape)") {
    val ev = Tables.events(spark, sf0001).filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"))
    val cols = Seq("event_id", "event_type", "value_w")
    val base = graft.operators.Corpus.winsorize(ev, "event_type", "value",
        lo = 0.01, hi = 0.99, outCol = "value_w")
      .select(cols.map(col): _*).as[(Long, String, Double)].collect().toSet
    val scan = graft.operators.Corpus.winsorize(ev, "event_type", "value",
        lo = 0.01, hi = 0.99, outCol = "value_w", useScan = true)
      .select(cols.map(col): _*).as[(Long, String, Double)].collect().toSet
    assert(scan === base)
  }

  test("madOutliers useScan path equals the percentile path (q130 shape)") {
    val ev = Tables.events(spark, sf0001).filter(col("value").isNotNull)
    def run(useScan: Boolean) =
      graft.operators.Drift.madOutliers(ev, "event_type", "value",
          k = 3.0, useScan = useScan)
        .select(col("event_type"), col("n"), col("n_outliers"),
          col("med_r"), col("mad_r"))
        .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(run(true) === run(false))
  }
}
