package graft

import org.apache.spark.sql.functions._

/** Linear-scaling evidence for [[graft.sinks.ShardExport]] — the
  * 100 TB claim is that an export costs exactly two corpus exchanges
  * (the rank range exchange and the bucket-aligned prefix-sum
  * exchange) plus the write, so wall AND shuffle bytes must track the
  * corpus linearly: a 4× corpus ⇒ ~4× shuffle, ~4× shards, ~linear
  * wall — never a super-linear blow-up from the prefix sum (a naive
  * single-partition cumsum would serialize the corpus through one
  * task) or from shard-count growth.
  *
  * Prints one JSON line:
  * `{"metric":"shard_scale","docs_1x":N,"docs_4x":4N,
  *   "export_1x_sec":…,"export_4x_sec":…,"shuffle_mb_1x":…,
  *   "shuffle_mb_4x":…,"shards_1x":…,"shards_4x":…,
  *   "wall_ratio":…,"shuffle_ratio":…}`.
  * Recorded in BASELINE.md (`shard_scale`).
  */
object ShardScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val base = args.headOption.map(_.toLong).getOrElse(20000L)
    val budget = args.lift(1).map(_.toLong).getOrElse(25000L)
    // ~50 tokens per doc, content deterministic in the id
    def corpus(n: Long) = spark.range(n).select(col("id").as("doc_id"))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(1), lit(50)),
          i => concat(lit("w"), pmod(hash(col("doc_id"), i), lit(100000))))))

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten); ()
      }
    })

    def export(n: Long, tag: String): (Double, Double, Long) = {
      val root = java.nio.file.Files
        .createTempDirectory(s"shard-scale-$tag").toString + "/root"
      val t0 = System.nanoTime()
      val s0 = shuffleBytes.get
      val m = graft.sinks.ShardExport.write(spark, corpus(n), "doc_id",
        "text", budget, salt = "bench", root)
      val nShards = m.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // listener bus drains asynchronously
      ((shuffleBytes.get - s0) / 1048576.0, wall, nShards)
    }

    export(base / 4, "warm") // JIT/codegen warm-up outside the timed region
    val (mb1, sec1, sh1) = export(base, "1x")
    val (mb4, sec4, sh4) = export(base * 4, "4x")

    println(f"""{"metric":"shard_scale","docs_1x":$base,"docs_4x":${base * 4},""" +
      f""""export_1x_sec":$sec1%.3f,"export_4x_sec":$sec4%.3f,""" +
      f""""shuffle_mb_1x":$mb1%.1f,"shuffle_mb_4x":$mb4%.1f,""" +
      f""""shards_1x":$sh1,"shards_4x":$sh4,""" +
      f""""wall_ratio":${sec4 / sec1}%.2f,"shuffle_ratio":${mb4 / mb1}%.2f}""")
    spark.stop()
  }
}
