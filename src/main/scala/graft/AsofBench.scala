package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key crossover benchmark for the as-of join: one key holding 90 %
  * of both sides — the regime where the single-window plan serializes
  * (the hot key's whole history sorts in ONE task) and the
  * `timeBucket` fallback ([[graft.operators.Joins.asofJoin]]) spreads
  * each key across time buckets.
  *
  * Prints one JSON line:
  * `{"metric":"asof_hotkey","rows":N,"single_sec":…,"bucketed_sec":…}`.
  * Recorded per round in BASELINE.md (`asof_hotkey`).
  */
object AsofBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val rows = args.headOption.map(_.toLong).getOrElse(5000000L)
    val span = 1000000000L // time domain [0, 1e9)
    def keyed(n: Long, idCol: String) = spark.range(n).select(
      when(col("id") < n * 9 / 10, 1L)
        .otherwise(pmod(col("id"), lit(1000L)) + 2).as("k"),
      pmod(hash(col("id")).cast("long") * 2654435761L, lit(span)).as("t"),
      col("id").as(idCol))
    val left = keyed(rows, "lid").withColumnRenamed("t", "tt").persist()
    val right = keyed(rows / 10, "qid").withColumnRenamed("t", "qt")
      .withColumn("px", (col("qid") % 1000).cast("double")).persist()
    left.count(); right.count()

    def plan(bucket: Long): DataFrame = graft.operators.Joins.asofJoin(
      left, right, Seq("k"), "tt", "qt", tieBreak = "qid", timeBucket = bucket)

    def time(f: => DataFrame): Double = {
      f.write.format("noop").mode("overwrite").save() // warm: codegen + JIT
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val single = time(plan(0L))
    val bucketed = time(plan(span / 256))
    println(s"""{"metric":"asof_hotkey","rows":$rows,""" +
      s""""single_sec":$single,"bucketed_sec":$bucketed}""")
    spark.stop()
  }
}
