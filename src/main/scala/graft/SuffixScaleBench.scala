package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale evidence for q194
  * ([[graft.operators.SuffixArray.repeatProfile]]): the scaladoc
  * claims the order-H profile is ONE range exchange of ≤ H extra bytes
  * per position plus doc/position-keyed collapses — so wall and
  * shuffle bytes must grow ~linearly in corpus characters. This main
  * MEASURES both at two corpus sizes (4× apart) so the claim is a
  * recorded ratio, not an assertion.
  *
  * The generator reuses the dedup-scale corpus shape: deterministic
  * ~240-char docs, ~2 % exact duplicates, ~5 % sharing one of 20 long
  * boilerplate openers — so the profile sees real repeated spans at
  * every size. The timed pass rebuilds from a COLD cache (the operator
  * materializes its result eagerly; without the clear, a second call
  * would be a CacheManager hit and measure nothing).
  *
  * Prints one JSON line per size:
  * `{"metric":"suffix_scale","docs":N,"chars":C,"sec":…,
  *   "shuffle_mb":…,"spill_mb":…}` — recorded in BASELINE.md
  * (`suffix_scale`).
  */
object SuffixScaleBench {
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
    // no persist on the generated docs: the corpus is a deterministic
    // shuffle-free projection of range(), and the timed pass clears the
    // whole cache anyway (see scaladoc)
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
      def profile(): DataFrame =
        graft.operators.SuffixArray.repeatProfile(docs, "doc_id", "text",
          maxOrder = 32, minLen = 20)
      profile().write.format("noop").mode("overwrite").save() // warm: JIT + codegen
      spark.catalog.clearCache()
      Thread.sleep(500) // listener bus drain
      shuffleBytes.set(0L); spillBytes.set(0L)
      val t0 = System.nanoTime()
      profile().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(s"""{"metric":"suffix_scale","docs":$n,"chars":$chars,""" +
        f""""sec":$sec%.2f,"shuffle_mb":${shuffleBytes.get() / 1048576},""" +
        f""""spill_mb":${spillBytes.get() / 1048576}}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
