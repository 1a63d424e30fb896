package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale evidence for [[graft.operators.Corpus.bm25TopK]] (q154): its
  * scaladoc claims the corpus token stream is pruned MAP-SIDE to
  * query-matching tokens before the only data-scale shuffle, so cost
  * should track the corpus linearly (scan-bound) with shuffle bytes
  * bounded by matching tokens. This main MEASURES wall and shuffle at
  * two corpus sizes on a deterministic synthetic corpus where ~4 % of
  * tokens match the query vocabulary. Content is deterministic in the
  * doc id — reruns measure the same corpus.
  *
  * Prints one JSON line per size:
  * `{"metric":"bm25_scale","docs":N,"sec":…,"shuffle_kb":…}`.
  * Recorded in BASELINE.md (`bm25_scale`).
  */
object Bm25ScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(200000L, 800000L)
    val toksPerDoc = 40

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    import spark.implicits._
    // 3 queries over a 25-term vocabulary that ~4 % of corpus tokens
    // hit (hash(id·40+i) % 30000 < 1200 → remapped into q0..q24)
    val queries = Seq(
      (0L, "q0 q1 q2 q3 q4"), (1L, "q5 q6 q7 q8 q9"),
      (2L, "q10 q11 q12 q13 q14")).toDF("qid", "qtext")

    sizes.foreach { n =>
      val docs = spark.range(n).select(col("id").as("doc_id"))
        .withColumn("text", concat_ws(" ",
          transform(sequence(lit(1), lit(toksPerDoc)), i => {
            val h = pmod(hash(col("doc_id") * toksPerDoc + i), lit(30000))
            when(h < 1200, concat(lit("q"), pmod(h, lit(25))))
              .otherwise(concat(lit("w"), h))
          })))
        .persist()
      docs.count()

      def run = graft.operators.Corpus.bm25TopK(
        docs, "doc_id", "text", queries, "qid", "qtext", k = 10)
      run.write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(500)
      // drop the operator's internal tf persist (and everything except
      // the re-persisted input) so the timed pass runs the REAL
      // scan+prune+aggregate path, not a cache read
      spark.catalog.clearCache()
      docs.persist(); docs.count()
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      run.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"""{"metric":"bm25_scale","docs":$n,"sec":$sec%.2f,""" +
        f""""shuffle_kb":${shuffleBytes.get() / 1024}}""")
      docs.unpersist(blocking = true)
    }
    spark.stop()
  }
}
