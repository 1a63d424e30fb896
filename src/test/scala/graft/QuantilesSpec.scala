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
}
