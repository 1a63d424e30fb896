package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale evidence for q206
  * ([[graft.operators.Dedup.sortedNeighborhoodPairs]]): the scaladoc
  * claims one range-exchange key sort, exactly `n·(window−1)`
  * candidates, and the exact-Jaccard verify — so wall and shuffle must
  * grow ~linearly in the corpus. This main MEASURES both at two sizes
  * (4× apart) on the [[DedupScaleBench]] corpus shape (~2 % exact
  * dups, ~1 % near-dups, ~5 % shared boilerplate openers —
  * deterministic in the doc id). The boilerplate family is the one
  * sorted-neighborhood is BUILT for: shared openers sort adjacent.
  *
  * Prints one JSON line per size:
  * `{"metric":"snm_scale","docs":N,"sec":…,"shuffle_mb":…,
  * "spill_mb":…,"pairs":P}` — recorded in BASELINE.md (`snm_scale`).
  */
object SnmScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(100000L, 400000L)
    val toksPerDoc = 40

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val spillBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        spillBytes.addAndGet(sc.stageInfo.taskMetrics.diskBytesSpilled)
      }
    })

    sizes.foreach { n =>
      def body(idExpr: org.apache.spark.sql.Column) =
        concat_ws(" ", transform(sequence(lit(1), lit(toksPerDoc)),
          i => concat(lit("w"), pmod(hash(idExpr * toksPerDoc + i), lit(30000)))))
      val boiler = concat_ws(" ", transform(sequence(lit(1), lit(12)),
        i => concat(lit("bp"),
          pmod(col("doc_id").divide(lit(20)).cast("long"), lit(20)) * 100 + i)))
      val docs = spark.range(n).select(col("id").as("doc_id"))
        .withColumn("src",
          when(pmod(col("doc_id"), lit(50)) === 0, pmod(col("doc_id"), lit(97)))
            .otherwise(col("doc_id")))
        .withColumn("text", concat_ws(" ",
          when(pmod(col("doc_id"), lit(20)) === 0, boiler).otherwise(lit("")),
          body(col("src")),
          when(pmod(col("doc_id"), lit(100)) === 3, lit("extratoken"))
            .otherwise(lit(""))))
        .select(col("doc_id"), col("text"))
        .persist()
      docs.count()

      def run(): DataFrame =
        graft.operators.Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
          window = 6, keyLen = 24)
      run().write.format("noop").mode("overwrite").save() // warm
      spark.catalog.clearCache()
      Thread.sleep(500)
      shuffleBytes.set(0L); spillBytes.set(0L)
      val t0 = System.nanoTime()
      val out = run()
      out.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val pairs = out.count()
      Thread.sleep(500)
      println(s"""{"metric":"snm_scale","docs":$n,""" +
        f""""sec":$sec%.2f,"shuffle_mb":${shuffleBytes.get() / 1048576},""" +
        f""""spill_mb":${spillBytes.get() / 1048576},"pairs":$pairs}""")
      spark.catalog.clearCache()
      docs.unpersist(blocking = true)
    }
    spark.stop()
  }
}
