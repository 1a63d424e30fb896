package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Daily-ingest dedup crossover: when a batch of B new documents
  * arrives against a standing corpus of N documents, the naive path
  * re-runs pairwise LSH over all N+B documents
  * ([[graft.operators.Dedup.minhashLshPairs]] on the union, filtered to
  * cross pairs); the incremental path
  * ([[graft.operators.Dedup.incrementalNearDup]]) broadcasts the
  * batch's band buckets and probes the corpus map-side. Both report
  * the same cross pairs; the delta is that the naive path's candidate
  * self-join shuffles the ENTIRE corpus bucket table every day, while
  * the incremental path shuffles only matched candidates — re-cluster
  * cost is O(N) daily, probe cost is O(B).
  *
  * Prints one JSON line:
  * `{"metric":"incr_neardup","corpus_docs":N,"batch_docs":B,
  *   "full_sec":…,"incr_sec":…,"full_shuffle_mb":…,"incr_shuffle_mb":…}`.
  * Recorded per round in BASELINE.md (`incr_neardup`).
  */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val corpusDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val batchDocs = args.lift(1).map(_.toLong).getOrElse(2000L)
    val toksPerDoc = 40
    // deterministic corpora; ~1 % of batch docs duplicate a corpus doc
    // (same generator seed word-for-word), the rest are fresh text
    def text(idExpr: org.apache.spark.sql.Column, tag: String) =
      concat_ws(" ", transform(sequence(lit(1), lit(toksPerDoc)),
        i => concat(lit("w"), pmod(hash(idExpr * toksPerDoc + i, lit(tag)), lit(20000)))))
    val corpus = spark.range(corpusDocs)
      .select(col("id").as("doc_id"), text(col("id"), "c").as("text")).persist()
    val batch = spark.range(batchDocs)
      .select((col("id") + corpusDocs).as("doc_id"),
        when(pmod(col("id"), lit(100)) === 0, text(pmod(col("id"), lit(1000)), "c"))
          .otherwise(text(col("id"), "fresh")).as("text")).persist()
    corpus.count(); batch.count()

    def fullPlan: DataFrame = graft.operators.Dedup.minhashLshPairs(
        corpus.unionByName(batch), "doc_id", "text")
      .filter(col("b_id") >= corpusDocs) // cross + within-batch pairs at the boundary
    def incrPlan: DataFrame = graft.operators.Dedup.incrementalNearDup(
      batch, corpus, "doc_id", "text")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def time(f: => DataFrame): (Double, Long) = {
      f.write.format("noop").mode("overwrite").save() // warm: codegen + JIT
      Thread.sleep(500) // listener bus drain
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain
      (sec, shuffleBytes.get())
    }
    val (tf, bf) = time(fullPlan)
    val (ti, bi) = time(incrPlan)
    println(s"""{"metric":"incr_neardup","corpus_docs":$corpusDocs,""" +
      s""""batch_docs":$batchDocs,"full_sec":$tf,"incr_sec":$ti,""" +
      s""""full_shuffle_mb":${bf / 1048576},"incr_shuffle_mb":${bi / 1048576}}""")
    spark.stop()
  }
}
