package graft

import org.apache.spark.sql.functions._

/** The honest comparison behind [[graft.operators.Quantiles.quantileScan]]:
  * exact `percentile` buffers the whole group on one reducer (state ∝
  * group size — the thing that dies at 100 TB), the bisection scan
  * re-reads the data O(log) times with bounded state. Both produce the
  * same median (asserted at 6 decimals). Wall-clock favors whoever's
  * bottleneck is cheaper at the tested size — the point of the table
  * is the MEMORY column, which only the scan keeps flat.
  *
  * Prints one JSON line:
  * `{"metric":"quantile_scan","rows":N,"groups":G,"percentile_sec":…,
  *   "scan_sec":…,"scan_rounds_bound":…}`.
  * Recorded in BASELINE.md (`quantile_scan`).
  */
object QuantileBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val groups = args.lift(1).map(_.toInt).getOrElse(1)

    // deterministic skewed doubles: exponential-ish tail via bit mixing
    val data = spark.range(rows).select(
        (col("id") % groups).cast("string").as("g"),
        (pmod(hash(col("id")), lit(1000000)).cast("double") / 1000.0 +
          when(pmod(col("id"), lit(97)) === 0, 5000.0).otherwise(0.0)).as("v"))
      .persist()
    data.count()

    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }
    // warm both paths once, then time
    data.groupBy("g").agg(expr("percentile(v, 0.5D)")).collect()
    graft.operators.Quantiles.quantileScan(data, "g", "v", 0.5).collect()

    val (tp, wantRows) = time(
      data.groupBy("g").agg(expr("percentile(v, 0.5D)").as("q")).collect())
    val want = wantRows.map(r => r.getString(0) -> r6(r.getDouble(1))).toMap
    val (ts, gotRows) = time(
      graft.operators.Quantiles.quantileScan(data, "g", "v", 0.5).collect())
    val got = gotRows.map(r => r.getString(0) -> r6(r.getDouble(2))).toMap
    require(got == want, s"scan disagrees with percentile: $got vs $want")

    // the vector family: p01/p50/p99 in ONE bisection (shared passes)
    // vs three independent scans vs one 3-array percentile aggregate
    val ps = Seq(0.01, 0.5, 0.99)
    val (tm, multiRows) = time(
      graft.operators.Quantiles.quantileScanMulti(data, "g", "v", ps).collect())
    val multi = multiRows
      .map(r => (r.getString(0), r.getDouble(1)) -> r6(r.getDouble(3))).toMap
    val (t3, _) = time(ps.foreach(p =>
      graft.operators.Quantiles.quantileScan(data, "g", "v", p).collect()))
    val (tp3, want3Rows) = time(data.groupBy("g")
      .agg(expr("percentile(v, array(0.01D, 0.5D, 0.99D))").as("qs")).collect())
    want3Rows.foreach { r =>
      val g = r.getString(0)
      val qs = r.getSeq[Double](1)
      ps.zipWithIndex.foreach { case (p, i) =>
        require(multi((g, p)) == r6(qs(i)),
          s"multi-scan disagrees with percentile at g=$g p=$p")
      }
    }

    println(s"""{"metric":"quantile_scan","rows":$rows,"groups":$groups,""" +
      s""""percentile_sec":$tp,"scan_sec":$ts,""" +
      s""""multi3_sec":$tm,"scan_x3_sec":$t3,"percentile3_sec":$tp3}""")
    spark.stop()
  }
}
