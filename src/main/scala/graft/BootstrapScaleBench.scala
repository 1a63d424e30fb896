package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bootstrap-band cost at corpus scale: the exact multinomial grid
  * ([[graft.operators.Eval.bootstrapMeanCI]]) materializes
  * `numResamples × n` draw rows and JOINS them back to the
  * position-keyed corpus — two corpus-scale exchanges (the rank and
  * the grid side of the join) that dominate once n is real. The
  * Poisson twin ([[graft.operators.Eval.bootstrapMeanCIPooled]])
  * folds all resample sums map-side in ONE corpus pass: the only
  * shuffle is ≤ numResamples partial rows per partition. Same
  * md5-deterministic discipline, statistically the same band
  * (EvalSpec pins the agreement).
  *
  * Prints one JSON line:
  * `{"metric":"bootstrap_scale","docs":n,"resamples":R,
  *   "grid_sec":…,"grid_shuffle_mb":…,"pooled_sec":…,
  *   "pooled_shuffle_mb":…,"pooled_4x_sec":…,"pooled_4x_shuffle_mb":…}`.
  * Recorded in BASELINE.md (`bootstrap_scale`).
  */
object BootstrapScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val resamples = args.lift(1).map(_.toInt).getOrElse(100)
    def corpus(rows: Long) = spark.range(rows)
      .select(col("id").as("doc_id"),
        (pmod(hash(col("id")), lit(5000)) + 40).cast("long").as("n_chars"))

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def time(f: => DataFrame): (Double, Long) = {
      f.write.format("noop").mode("overwrite").save() // warm: codegen + JIT
      Thread.sleep(500)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      (sec, shuffleBytes.get())
    }

    val base = corpus(n).persist(); base.count()
    val (tg, bg) = time(graft.operators.Eval.bootstrapMeanCI(
      base, "doc_id", "n_chars", numResamples = resamples))
    val (tp, bp) = time(graft.operators.Eval.bootstrapMeanCIPooled(
      base, "doc_id", "n_chars", numResamples = resamples))
    base.unpersist()
    val big = corpus(4 * n).persist(); big.count()
    val (tp4, bp4) = time(graft.operators.Eval.bootstrapMeanCIPooled(
      big, "doc_id", "n_chars", numResamples = resamples))
    big.unpersist()

    println(s"""{"metric":"bootstrap_scale","docs":$n,"resamples":$resamples,""" +
      s""""grid_sec":$tg,"grid_shuffle_mb":${bg / 1048576},""" +
      s""""pooled_sec":$tp,"pooled_shuffle_mb":${bp / 1048576},""" +
      s""""pooled_4x_sec":$tp4,"pooled_4x_shuffle_mb":${bp4 / 1048576}}""")
    spark.stop()
  }
}
