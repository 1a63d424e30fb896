package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale evidence for q196
  * ([[graft.operators.SuffixArray.contamination]]): the scaladoc
  * claims the cross-corpus scan is ONE src-tagged range exchange of
  * ≤ H extra bytes per position plus slice-local window passes and
  * doc-keyed collapses — so wall and shuffle bytes must grow ~linearly
  * in combined corpus characters, independent of the train/eval ratio.
  * This main MEASURES both at two corpus sizes (4× apart).
  *
  * The generator reuses the [[SuffixScaleBench]] corpus shape
  * (deterministic ~240-char docs, ~2 % exact duplicates, ~5 % sharing
  * one of 20 long boilerplate openers), split 90/10 into train/eval by
  * `doc_id % 10` — the dup and boilerplate families straddle the
  * split, so the scan sees real train-verbatim contamination at every
  * size. The timed pass rebuilds from a COLD cache.
  *
  * Prints one JSON line per size:
  * `{"metric":"contam_scale","docs":N,"chars":C,"sec":…,
  *   "shuffle_mb":…,"spill_mb":…}` — recorded in BASELINE.md
  * (`contam_scale`).
  */
object ContamScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(8000L, 32000L)
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
    def gen(n: Long): DataFrame = {
      def body(idExpr: org.apache.spark.sql.Column) =
        concat_ws(" ", transform(sequence(lit(1), lit(toksPerDoc)),
          i => concat(lit("w"), pmod(hash(idExpr * toksPerDoc + i), lit(30000)))))
      val boiler = concat_ws(" ", transform(sequence(lit(1), lit(12)),
        i => concat(lit("bp"),
          pmod(col("doc_id").divide(lit(20)).cast("long"), lit(20)) * 100 + i)))
      spark.range(n).select(col("id").as("doc_id"))
        .withColumn("src",
          when(pmod(col("doc_id"), lit(50)) === 0, pmod(col("doc_id"), lit(97)))
            .otherwise(col("doc_id")))
        .withColumn("text", concat_ws(" ",
          when(pmod(col("doc_id"), lit(20)) === 0, boiler).otherwise(lit("")),
          body(col("src"))))
        .select(col("doc_id"), col("text"))
    }

    sizes.foreach { n =>
      val docs = gen(n)
      val chars = docs.select(sum(length(col("text")))).head().getLong(0)
      val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val eval = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      def contam(): DataFrame =
        graft.operators.SuffixArray.contamination(train, eval,
          "doc_id", "text", maxOrder = 32, minLen = 20)
      contam().write.format("noop").mode("overwrite").save() // warm: JIT + codegen
      spark.catalog.clearCache()
      Thread.sleep(500) // listener bus drain
      shuffleBytes.set(0L); spillBytes.set(0L)
      val t0 = System.nanoTime()
      contam().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(s"""{"metric":"contam_scale","docs":$n,"chars":$chars,""" +
        f""""sec":$sec%.2f,"shuffle_mb":${shuffleBytes.get() / 1048576},""" +
        f""""spill_mb":${spillBytes.get() / 1048576}}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
