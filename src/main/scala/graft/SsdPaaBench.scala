package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large-probe subsequence-search benchmark: the exact ×L fan-out
  * ([[graft.operators.TimeSeries.ssdTopK]]) vs the PAA lower-bound
  * propose/verify path ([[graft.operators.TimeSeries.ssdTopKPaa]]) at
  * L = 512, S = 16 — the regime the PAA path exists for (the exact
  * path multiplies every row by 512; propose multiplies by S and only
  * τ-survivors pay the exact price). Equality of the two top-k lists
  * is asserted before timing — a fast wrong answer is no answer.
  *
  * Prints one JSON line:
  * `{"metric":"ssd_paa","rows":N,"l":512,"segments":16,
  *   "exact_fanout_rows":…,"propose_fanout_rows":…,
  *   "exact_sec":…,"paa_sec":…}`.
  * Recorded per round in BASELINE.md (`ssd_paa`).
  */
object SsdPaaBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val keys = args.headOption.map(_.toInt).getOrElse(20)
    val perKey = 3000
    val l = 512
    val segments = 16
    def v(key: Int, i: Int): Double =
      ((i * 37 + key * 101) % 9973) / 99.73 + (i % 13) * 0.1
    val probe = Array.tabulate(l)(j => v(7, j + 1000))
    val series = (for (k <- 0 until keys; i <- 1 to perKey)
      yield (s"k$k", i.toLong, v(k, i)))
      .toDF("key", "idx", "v").persist()
    val nRows = series.count()
    val nWindows = keys.toLong * (perKey - l + 1)

    def exact(): DataFrame = graft.operators.TimeSeries.ssdTopK(
      series, "key", "idx", "v", probe, k = 20)
    def paa(): DataFrame = graft.operators.TimeSeries.ssdTopKPaa(
      series, "key", "idx", "v", probe, k = 20, segments = segments)

    val a = exact().collect().toSeq
    val b = paa().collect().toSeq
    require(a == b, s"PAA path diverged from exact: $b vs $a")

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().collect()
      (System.nanoTime() - t0) / 1e9
    }
    val exactSec = time(exact _)
    val paaSec = time(paa _)
    println(s"""{"metric":"ssd_paa","rows":$nRows,"l":$l,""" +
      s""""segments":$segments,"exact_fanout_rows":${nRows * l},""" +
      s""""propose_fanout_rows":${nWindows * segments},""" +
      s""""exact_sec":$exactSec,"paa_sec":$paaSec}""")

    // ---- hot-key regime: the SAME total rows concentrated in ONE key.
    // Before round 13 the propose phase ran a Window.partitionBy(key)
    // prefix sum — one task owning the whole series here; the
    // block-local propose bounds every task by B regardless of key
    // cardinality, so this config must cost about the same as the
    // many-key one rather than serializing.
    val hotN = keys * perKey
    val hotSeries = (1 to hotN).map(i => ("hot", i.toLong, v(0, i)))
      .toDF("key", "idx", "v").repartition(32).persist()
    hotSeries.count()
    val hotProbe = Array.tabulate(l)(j => v(0, j + 1000))
    def hotExact(): DataFrame = graft.operators.TimeSeries.ssdTopK(
      hotSeries, "key", "idx", "v", hotProbe, k = 20)
    def hotPaa(): DataFrame = graft.operators.TimeSeries.ssdTopKPaa(
      hotSeries, "key", "idx", "v", hotProbe, k = 20, segments = segments)
    val ha = hotExact().collect().toSeq
    val hb = hotPaa().collect().toSeq
    require(ha == hb, s"hot-key PAA diverged from exact: $hb vs $ha")
    val hotExactSec = time(hotExact _)
    val hotPaaSec = time(hotPaa _)
    println(s"""{"metric":"ssd_paa_hotkey","rows":$hotN,"keys":1,""" +
      s""""l":$l,"segments":$segments,""" +
      s""""exact_sec":$hotExactSec,"paa_sec":$hotPaaSec}""")
    spark.stop()
  }
}
