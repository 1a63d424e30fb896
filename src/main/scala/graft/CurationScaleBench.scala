package graft

import org.apache.spark.sql.functions._

/** Per-batch cost of the COMPOSED curation loop as the standing tables
  * grow — the O(batch) daily-cost claim, measured. [[graft.streaming
  * .CurationLoop]] drives three incremental sinks per batch; the
  * quantile and stats sinks fold into per-group state (flat by
  * construction), but the dedup index's per-batch directories make the
  * probe leg's filesystem cost grow O(#batches) until
  * [[graft.sinks.DedupIndexSink.compact]] folds them (see
  * `dedup_compact`). This bench runs N identical-size batches through
  * TWO roots — one never compacted, one compacted every `compactEvery`
  * batches — and reports the per-batch wall at the start, middle, and
  * end of each run plus the total compaction time paid.
  *
  * Prints one JSON line:
  * `{"metric":"curation_scale","batches":N,"docs_per_batch":D,
  *   "plain_first_sec":…,"plain_mid_sec":…,"plain_last_sec":…,
  *   "compacted_first_sec":…,"compacted_mid_sec":…,
  *   "compacted_last_sec":…,"compact_every":K,"compact_total_sec":…}`.
  * Recorded in BASELINE.md (`curation_scale`).
  */
object CurationScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val nBatches = args.headOption.map(_.toInt).getOrElse(36)
    val docsPerBatch = args.lift(1).map(_.toLong).getOrElse(400L)
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(12)
    val toksPerDoc = 30
    def text(idExpr: org.apache.spark.sql.Column, tag: String) =
      concat_ws(" ", transform(sequence(lit(1), lit(toksPerDoc)),
        i => concat(lit("w"), pmod(hash(idExpr * toksPerDoc + i, lit(tag)), lit(20000)))))
    def batchOf(b: Long) = spark.range(docsPerBatch)
      .select((col("id") + b * docsPerBatch).as("doc_id"))
      .withColumn("lang", concat(lit("l"), pmod(col("doc_id"), lit(4))))
      .withColumn("text",
        when(pmod(col("doc_id"), lit(50)) === 0 && lit(b) > 0,
          text(pmod(col("doc_id"), lit(docsPerBatch)), "c0"))
          .otherwise(text(col("doc_id"), s"c$b")))
      .withColumn("quality", (pmod(col("doc_id"), lit(997)) + 1).cast("double"))

    val work = java.nio.file.Files.createTempDirectory("curation-scale")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(root: String, compact: Boolean,
            nB: Int = nBatches): (Double, Double, Double, Double) = {
      var (first, mid, last, compSec) = (0.0, 0.0, 0.0, 0.0)
      (0 until nB).foreach { b =>
        val sec = timed {
          graft.streaming.CurationLoop(spark, batchOf(b.toLong), root,
            "doc_id", "text", Seq("lang"), Seq("lang"), "quality",
            b.toLong).count(): Unit
        }
        if (b == 0) first = sec
        if (b == nB / 2) mid = sec
        if (b == nB - 1) last = sec
        if (compact && (b + 1) % compactEvery == 0 && b + 1 < nB)
          compSec += timed {
            graft.streaming.CurationLoop.compact(spark, root): Unit
          }
      }
      (first, mid, last, compSec)
    }
    // warm the code paths (JIT/codegen, both loop and compaction) so
    // first-use cost lands on neither measured run
    run(work.resolve("warm/lake").toString, compact = false, nB = 4)
    graft.streaming.CurationLoop.compact(spark,
      work.resolve("warm/lake").toString)

    val plainRoot = work.resolve("plain/lake").toString
    val compactedRoot = work.resolve("compacted/lake").toString
    val (pf, pm, pl, _) = run(plainRoot, compact = false)
    val (cf, cm, cl, cs) = run(compactedRoot, compact = true)

    // the flattest point: one more identical batch on each root, the
    // compacted one probed right after a fresh fold (zero tail dirs) —
    // the remaining delta vs batch 1 is the honest O(index bytes)
    // probe compute, everything layout is gone
    val csFinal = timed {
      graft.streaming.CurationLoop.compact(spark, compactedRoot): Unit
    }
    val pExtra = timed {
      graft.streaming.CurationLoop(spark, batchOf(nBatches.toLong),
        plainRoot, "doc_id", "text", Seq("lang"), Seq("lang"), "quality",
        nBatches.toLong).count(): Unit
    }
    val cExtra = timed {
      graft.streaming.CurationLoop(spark, batchOf(nBatches.toLong),
        compactedRoot, "doc_id", "text", Seq("lang"), Seq("lang"),
        "quality", nBatches.toLong).count(): Unit
    }

    // lake bytes: the loop's optional fifth sink writes each batch
    // similarity-ordered; measure its on-disk bytes against an
    // arrival-ordered control write of the SAME rows. The fixture here
    // carries ~30 % near-dup token mass per batch (every 3rd doc
    // re-derives batch-0 text), the web-crawl-like regime where the
    // ordered layout pays (BASELINE `layout_compress`)
    def dupBatchOf(b: Long) = spark.range(docsPerBatch)
      .select((col("id") + b * docsPerBatch).as("doc_id"))
      .withColumn("lang", concat(lit("l"), pmod(col("doc_id"), lit(4))))
      .withColumn("text",
        when(pmod(col("doc_id"), lit(3)) === 0,
          text(pmod(col("doc_id"), lit(docsPerBatch / 10)), "c0"))
          .otherwise(text(col("doc_id"), s"c$b")))
      .withColumn("quality", (pmod(col("doc_id"), lit(997)) + 1).cast("double"))
    val lakeLoopRoot = work.resolve("lakeloop/lake").toString
    val lakeBatches = 12
    (0 until lakeBatches).foreach { b =>
      graft.streaming.CurationLoop(spark, dupBatchOf(b.toLong), lakeLoopRoot,
        "doc_id", "text", Seq("lang"), Seq("lang"), "quality",
        b.toLong, lakeFiles = 1).count(): Unit
    }
    val arrivalDir = work.resolve("lake-arrival").toString
    (0 until lakeBatches).foreach { b =>
      dupBatchOf(b.toLong).write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(arrivalDir,
          s"ingest_batch=$b").toString)
    }
    def dirBytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      walk(new java.io.File(dir))
    }
    val orderedBytes = dirBytes(
      graft.streaming.CurationLoop.lakeRoot(lakeLoopRoot))
    val arrivalBytes = dirBytes(arrivalDir)
    // cleaned + ordered (round 18): the same batches through the loop
    // with the line filter on — duplicated lines are deleted BEFORE the
    // lake write (the Dolma order: dedup paragraphs, then land), so
    // cleaned+ordered must come in at or under ordered
    val cleanedLoopRoot = work.resolve("lakeclean/lake").toString
    (0 until lakeBatches).foreach { b =>
      graft.streaming.CurationLoop(spark, dupBatchOf(b.toLong),
        cleanedLoopRoot, "doc_id", "text", Seq("lang"), Seq("lang"),
        "quality", b.toLong, lakeFiles = 1, cleanLines = true)
        .count(): Unit
    }
    val cleanedBytes = dirBytes(
      graft.streaming.CurationLoop.lakeRoot(cleanedLoopRoot))
    // global OPTIMIZE (round 18): fold the per-batch-ordered lake into
    // one globally similarity-ordered generation — cross-batch dup
    // mass (the same base texts re-arriving every batch) becomes
    // page-adjacent, so global bytes must land at or under the
    // per-batch-ordered total, in 1/12th the files
    val optSec = timed {
      graft.streaming.CurationLoop.optimizeLake(spark, lakeLoopRoot,
        "doc_id", "text", nFiles = 1): Unit
    }
    val globalBytes = dirBytes(
      graft.streaming.CurationLoop.lakeRoot(lakeLoopRoot))

    println(s"""{"metric":"curation_scale","batches":$nBatches,""" +
      s""""docs_per_batch":$docsPerBatch,"plain_first_sec":$pf,""" +
      s""""plain_mid_sec":$pm,"plain_last_sec":$pl,""" +
      s""""plain_posttail_sec":$pExtra,""" +
      s""""compacted_first_sec":$cf,"compacted_mid_sec":$cm,""" +
      s""""compacted_last_sec":$cl,"compacted_fresh_sec":$cExtra,""" +
      s""""compact_every":$compactEvery,""" +
      s""""compact_total_sec":${cs + csFinal},""" +
      s""""lake_batches":$lakeBatches,""" +
      s""""lake_ordered_bytes":$orderedBytes,""" +
      s""""lake_arrival_bytes":$arrivalBytes,""" +
      s""""lake_cleaned_bytes":$cleanedBytes,""" +
      s""""lake_global_bytes":$globalBytes,""" +
      s""""lake_optimize_sec":$optSec}""")
    spark.stop()
  }
}
