package graft

import org.apache.spark.sql.functions._

/** Per-batch cost of the standing LINE-dedup filter as the hash set
  * grows — the O(batch) daily-cost claim for
  * [[graft.sinks.LineDedupSink]], measured. Each batch carries fresh
  * lines plus a fixed share of boilerplate repeated from batch 0, so
  * the standing set grows linearly while per-batch work should track
  * the BATCH (one anti-join probe + new-hash fold), not the corpus.
  * As with the dedup index, append-only per-batch directories make the
  * probe's filesystem cost O(#batches) until [[graft.sinks
  * .LineDedupSink.compact]] folds them — the bench runs two roots,
  * never-compacted vs compacted every `compactEvery`, and reports
  * per-batch wall at the start, middle, and end plus compaction time.
  *
  * Prints one JSON line:
  * `{"metric":"linededup_scale","batches":N,"docs_per_batch":D,
  *   "lines_per_doc":L,"plain_first_sec":…,"plain_mid_sec":…,
  *   "plain_last_sec":…,"compacted_first_sec":…,"compacted_mid_sec":…,
  *   "compacted_last_sec":…,"compacted_fresh_sec":…,
  *   "compact_every":K,"compact_total_sec":…,
  *   "probe_shuffle_mb_full":…,"probe_shuffle_mb_empty":…,
  *   "standing_hashes":…}` — the two shuffle columns are the round-17
  * probe-direction evidence: per-batch shuffle write at full standing
  * size vs zero standing state must be ~equal (the batch winner
  * collapse only; standing hashes never ride an exchange).
  * Recorded in BASELINE.md (`linededup_scale`).
  */
object LineDedupScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val nBatches = args.headOption.map(_.toInt).getOrElse(36)
    val docsPerBatch = args.lift(1).map(_.toLong).getOrElse(400L)
    val linesPerDoc = 12
    val toksPerLine = 8
    // every doc: 1/4 boilerplate lines (drawn from batch-0's universe,
    // so they dedup against the standing set from batch 1 on), rest
    // unique to (batch, doc, line)
    def lineText(tag: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(1), lit(toksPerLine)),
        i => concat(lit("w"), pmod(hash(tag, i), lit(500000)))))
    def batchOf(b: Long) = spark.range(docsPerBatch)
      .select((col("id") + b * docsPerBatch).as("doc_id"))
      .withColumn("text", concat_ws("\n",
        transform(sequence(lit(0), lit(linesPerDoc - 1)), j =>
          when(pmod(j, lit(4)) === 0,
            lineText(concat(lit("bp"), pmod(col("doc_id") * linesPerDoc + j,
              lit(docsPerBatch * linesPerDoc / 4)))))
            .otherwise(lineText(concat(lit(s"u$b:"),
              col("doc_id") * linesPerDoc + j))))))

    val work = java.nio.file.Files.createTempDirectory("linededup-scale")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // shuffle-write accounting (round-17 verdict evidence column): the
    // probe must shuffle O(batch) — the winner collapse — never the
    // standing set, so probe shuffle at full standing size must match
    // the empty-standing baseline instead of growing with the corpus
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten); ()
      }
    })
    def shuffledMb(f: => Unit): Double = {
      val s0 = shuffleBytes.get
      f
      Thread.sleep(1500) // listener bus drains asynchronously
      (shuffleBytes.get - s0) / 1048576.0
    }
    def run(root: String, compact: Boolean,
            nB: Int = nBatches): (Double, Double, Double, Double) = {
      var (first, mid, last, compSec) = (0.0, 0.0, 0.0, 0.0)
      (0 until nB).foreach { b =>
        val sec = timed {
          graft.sinks.LineDedupSink.maintain(spark, batchOf(b.toLong),
            root, "doc_id", "text", b.toLong).count(): Unit
        }
        if (b == 0) first = sec
        if (b == nB / 2) mid = sec
        if (b == nB - 1) last = sec
        if (compact && (b + 1) % 12 == 0 && b + 1 < nB)
          compSec += timed {
            graft.sinks.LineDedupSink.compact(spark, root): Unit
          }
      }
      (first, mid, last, compSec)
    }
    // warm code paths so first-use cost lands on neither measured run
    run(work.resolve("warm/idx").toString, compact = false, nB = 4)
    graft.sinks.LineDedupSink.compact(spark, work.resolve("warm/idx").toString)

    val plainRoot = work.resolve("plain/idx").toString
    val compactedRoot = work.resolve("compacted/idx").toString
    val (pf, pm, pl, _) = run(plainRoot, compact = false)
    val (cf, cm, cl, cs) = run(compactedRoot, compact = true)

    // one more batch on the compacted root right after a fresh fold —
    // the flattest point: the remaining delta vs batch 1 is the honest
    // O(standing hashes) probe, all directory layout gone
    val csFinal = timed {
      graft.sinks.LineDedupSink.compact(spark, compactedRoot): Unit
    }
    var cExtra = 0.0
    val fullMb = shuffledMb {
      cExtra = timed {
        graft.sinks.LineDedupSink.maintain(spark, batchOf(nBatches.toLong),
          compactedRoot, "doc_id", "text", nBatches.toLong).count(): Unit
      }
    }
    // the empty-standing baseline: same batch shape, zero prior state —
    // any excess of fullMb over this is standing state riding a shuffle
    val emptyMb = shuffledMb {
      graft.sinks.LineDedupSink.maintain(spark, batchOf(nBatches.toLong),
        work.resolve("baseline/idx").toString, "doc_id", "text", 0L)
        .count(): Unit
    }
    val standing = graft.sinks.LineDedupSink.read(spark, compactedRoot).count()

    println(s"""{"metric":"linededup_scale","batches":$nBatches,""" +
      s""""docs_per_batch":$docsPerBatch,"lines_per_doc":$linesPerDoc,""" +
      s""""plain_first_sec":$pf,"plain_mid_sec":$pm,"plain_last_sec":$pl,""" +
      s""""compacted_first_sec":$cf,"compacted_mid_sec":$cm,""" +
      s""""compacted_last_sec":$cl,"compacted_fresh_sec":$cExtra,""" +
      s""""compact_every":12,"compact_total_sec":${cs + csFinal},""" +
      s""""probe_shuffle_mb_full":${math.rint(fullMb * 1000) / 1000},""" +
      s""""probe_shuffle_mb_empty":${math.rint(emptyMb * 1000) / 1000},""" +
      s""""standing_hashes":$standing}""")
    spark.stop()
  }
}
