package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale evidence for the two slowest inherent queries: q37
  * (end-to-end corpus dedup, [[graft.operators.Dedup.dedupCorpus]]) and
  * q93 (cross-document repeated substrings,
  * [[graft.operators.Dedup.repeatedWindows]]). Both carry "linear in
  * the corpus" claims in their scaladocs; this main MEASURES wall and
  * shuffle bytes at two corpus sizes so the claim is a recorded ratio,
  * not an assertion.
  *
  * The generator models the documents fixture's duplication structure
  * at adjustable size: ~2 % exact duplicate docs, ~1 % near-duplicates
  * (one token appended to a duplicated body), and ~5 % of docs opening
  * with one of 20 shared boilerplate spans (long enough that q93's
  * 32-char windows repeat across documents). Content is deterministic
  * in the doc id — reruns measure the same corpus.
  *
  * Prints one JSON line per size:
  * `{"metric":"dedup_scale","docs":N,"q37_sec":…,"q37_shuffle_mb":…,
  *   "q37_spill_mb":…,"q93_sec":…,"q93_shuffle_mb":…,"q93_spill_mb":…}`.
  * Recorded in BASELINE.md (`dedup_scale`). Spill is reported because a
  * fixed local heap makes wall time bend superlinear exactly when the
  * per-core data outgrows memory — the shuffle-byte ratio is the
  * scale-shape signal, spill explains any wall divergence.
  */
object DedupScaleBench {
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
    def time(f: => DataFrame): (Double, Long, Long) = {
      f.write.format("noop").mode("overwrite").save() // warm: codegen + JIT
      Thread.sleep(500) // listener bus drain
      shuffleBytes.set(0L); spillBytes.set(0L)
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain
      (sec, shuffleBytes.get(), spillBytes.get())
    }

    sizes.foreach { n =>
      // body text deterministic in a SOURCE id so duplicates repeat it
      def body(idExpr: org.apache.spark.sql.Column) =
        concat_ws(" ", transform(sequence(lit(1), lit(toksPerDoc)),
          i => concat(lit("w"), pmod(hash(idExpr * toksPerDoc + i), lit(30000)))))
      // ~5 % of docs share one of 20 boilerplate openers (>= 64 chars
      // once rendered, so 32-char windows repeat across documents);
      // span choice uses id/20 so it is independent of the id%20
      // eligibility gate (same modulus would pin every doc to span 0)
      val boiler = concat_ws(" ", transform(sequence(lit(1), lit(12)),
        i => concat(lit("bp"),
          pmod(col("doc_id").divide(lit(20)).cast("long"), lit(20)) * 100 + i)))
      val docs = spark.range(n).select(col("id").as("doc_id"))
        .withColumn("src",
          // 2 % exact dups + 1 % near-dups copy the body of doc (id % 97)
          when(pmod(col("doc_id"), lit(50)) === 0, pmod(col("doc_id"), lit(97)))
            .otherwise(col("doc_id")))
        .withColumn("text", concat_ws(" ",
          when(pmod(col("doc_id"), lit(20)) === 0, boiler).otherwise(lit("")),
          body(col("src")),
          // near-dups (1 %) append one extra token so Jaccard ~ n/(n+1)
          when(pmod(col("doc_id"), lit(100)) === 3, lit("extratoken"))
            .otherwise(lit(""))))
        .select(col("doc_id"), col("text"))
        .persist()
      docs.count()

      val (t37, b37, s37) = time(
        graft.operators.Dedup.dedupCorpus(docs, "doc_id", "text"))
      val (t93, b93, s93) = time(
        graft.operators.Dedup.repeatedWindows(docs, "doc_id", "text"))
      println(s"""{"metric":"dedup_scale","docs":$n,""" +
        f""""q37_sec":$t37%.2f,"q37_shuffle_mb":${b37 / 1048576},""" +
        f""""q37_spill_mb":${s37 / 1048576},""" +
        f""""q93_sec":$t93%.2f,"q93_shuffle_mb":${b93 / 1048576},""" +
        f""""q93_spill_mb":${s93 / 1048576}}""")
      docs.unpersist(blocking = true)
    }
    spark.stop()
  }
}
