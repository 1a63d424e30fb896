package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global-ranking crossover benchmark: Spark's partition-less
  * `ntile(k)` window (ALL rows coalesce into one task) vs
  * [[graft.operators.Ranks.ntileExact]]'s two-level decomposition —
  * the q61 rewrite, measured.
  *
  * Prints one JSON line:
  * `{"metric":"rank_ntile","rows":N,"window_sec":…,"twolevel_sec":…}`.
  * Recorded per round in BASELINE.md (`rank_ntile`).
  */
object RankBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val df = spark.range(rows).select(col("id"),
      (hash(col("id")) % 1000000).cast("double").as("v")).persist()
    df.count()

    def windowPlan: DataFrame = df.withColumn("q",
      ntile(4).over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
    def twoLevelPlan: DataFrame = graft.operators.Ranks.ntileExact(
      df, Seq(col("v").desc, col("id").asc), k = 4, outCol = "q")

    def time(f: => DataFrame): Double = {
      f.write.format("noop").mode("overwrite").save() // warm: codegen + JIT
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val tw = time(windowPlan)
    val tt = time(twoLevelPlan)
    println(s"""{"metric":"rank_ntile","rows":$rows,""" +
      s""""window_sec":$tw,"twolevel_sec":$tt}""")
    spark.stop()
  }
}
