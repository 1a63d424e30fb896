package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Decontamination crossover benchmark for the INVERTED shape — the
  * "benchmark" side too large to hash-set broadcast, so the exact
  * confirm join must shuffle ([[graft.operators.Corpus.decontaminate]]
  * with `broadcastBench = false`). The contender prepends the 64 KB
  * Bloom probe ([[graft.operators.Corpus.decontaminateBloom]]): same
  * shuffle join, but only shingles that might match ever reach it.
  * Both paths produce identical results (SketchesSpec pins it); the
  * delta is purely shuffle volume — the overlap fraction here is a few
  * percent, which is the realistic decontamination regime (most train
  * shingles match nothing).
  *
  * Local wall-clock understates the win (a local[n] "shuffle" is a
  * memory copy; the cluster cost is the network), so the bench reports
  * BOTH seconds and total shuffle-write bytes per path — bytes are the
  * scale-invariant signal.
  *
  * Prints one JSON line:
  * `{"metric":"bloom_decontam","train_docs":N,"bench_docs":M,
  *   "exact_sec":…,"bloom_sec":…,"exact_shuffle_mb":…,"bloom_shuffle_mb":…}`.
  * Recorded per round in BASELINE.md (`bloom_decontam`).
  */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val trainDocs = args.headOption.map(_.toLong).getOrElse(300000L)
    val benchDocs = args.lift(1).map(_.toLong).getOrElse(50000L)
    val toksPerDoc = 60
    // two mostly-disjoint vocabularies with a small planted overlap:
    // train draws words from [0, 5000); bench from [4800, 9800) — only
    // shingles built entirely inside the 200-word overlap band can match
    def corpus(n: Long, base: Int, tag: String): DataFrame =
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(toksPerDoc)),
          i => concat(lit("w"), pmod(hash(col("id") * toksPerDoc + i, lit(tag)), lit(5000))
            + lit(base))))
          .as("text"))
    val train = corpus(trainDocs, 0, "t").persist()
    val bench = corpus(benchDocs, 4800, "b").persist()
    train.count(); bench.count()

    def exactPlan: DataFrame = graft.operators.Corpus.decontaminate(
      train, bench, "doc_id", "text", n = 3, broadcastBench = false)
    def bloomPlan: DataFrame = graft.operators.Corpus.decontaminateBloom(
      train, bench, "doc_id", "text", n = 3, broadcastBench = false)

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
    val (te, be) = time(exactPlan)
    val (tb, bb) = time(bloomPlan)
    println(s"""{"metric":"bloom_decontam","train_docs":$trainDocs,""" +
      s""""bench_docs":$benchDocs,"exact_sec":$te,"bloom_sec":$tb,""" +
      s""""exact_shuffle_mb":${be / 1048576},"bloom_shuffle_mb":${bb / 1048576}}""")
    spark.stop()
  }
}
