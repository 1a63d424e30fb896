package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew crossover benchmark for per-key top-k: a few HOT keys × millions
  * of rows — the regime the bounded-heap aggregate ([[graft.operators.TopK]])
  * was hypothesized to win (the window must sort multi-million-row
  * partitions; the heap keeps k rows per partition and never sorts).
  *
  * Measured verdict (BASELINE.md `skew_topk`, round 4): the hypothesis
  * FAILED — the window plan wins every tried regime, including 4 keys ×
  * 50M rows under a 2 GB heap where its sorts spill. That measurement is
  * why `spark.graft.topkHeapRewrite.enabled` defaults to false.
  *
  * Prints one JSON line:
  * `{"metric":"skew_topk","keys":K,"rows":N,"window_sec":…,"heap_sec":…}`.
  * Recorded per round in BASELINE.md.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val keys = args.headOption.map(_.toInt).getOrElse(16)
    val rows = args.lift(1).map(_.toLong).getOrElse(8000000L)
    val df = spark.range(rows)
      .select((col("id") % keys).as("k"),
        (hash(col("id")) % 1000000).cast("double").as("v"), col("id"))
      .persist()
    df.count()

    def windowPlan: DataFrame = {
      val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))
      df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
    }
    def heapPlan: DataFrame = graft.operators.TopK.topKPerKey(df, Seq("k"),
      struct(negate(col("v")), col("id")), Seq("id", "v"), 3)

    def time(f: => DataFrame): Double = {
      f.write.format("noop").mode("overwrite").save() // warm: codegen + JIT
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val tw = time(windowPlan)
    val th = time(heapPlan)
    println(s"""{"metric":"skew_topk","keys":$keys,"rows":$rows,""" +
      s""""window_sec":$tw,"heap_sec":$th}""")
    spark.stop()
  }
}
