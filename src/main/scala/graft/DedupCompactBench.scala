package graft

import org.apache.spark.sql.functions._

/** Standing-index compaction payoff: after B daily batches, the
  * append-only [[graft.sinks.DedupIndexSink]] layout holds B
  * `ingest_batch=` directories (plus B marker checks for readers), so
  * a probe's scan-side cost carries O(B) filesystem metadata and
  * per-directory small files on top of the O(index bytes) compute that
  * is legitimately there. [[graft.sinks.DedupIndexSink.compact]] folds
  * the sealed batches into ONE generation of target-sized files — this
  * bench probes the SAME fresh batch against the same index content in
  * both layouts and reports the delta, which is pure layout cost.
  *
  * Protocol: build a B-batch index (timing `maintain` at the first,
  * middle, and last batch — the uncompacted creep), clone the root,
  * compact the clone, then probe one identical fresh batch against
  * both roots. Prints one JSON line:
  * `{"metric":"dedup_compact","batches":B,"docs_per_batch":D,
  *   "build_first_sec":…,"build_mid_sec":…,"build_last_sec":…,
  *   "probe_uncompacted_sec":…,"probe_compacted_sec":…,
  *   "dirs_uncompacted":…,"dirs_compacted":…,
  *   "files_uncompacted":…,"files_compacted":…}`.
  * Recorded in BASELINE.md (`dedup_compact`).
  */
object DedupCompactBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import graft.sinks.DedupIndexSink

    val nBatches = args.headOption.map(_.toInt).getOrElse(48)
    val docsPerBatch = args.lift(1).map(_.toLong).getOrElse(400L)
    val toksPerDoc = 30
    def text(idExpr: org.apache.spark.sql.Column, tag: String) =
      concat_ws(" ", transform(sequence(lit(1), lit(toksPerDoc)),
        i => concat(lit("w"), pmod(hash(idExpr * toksPerDoc + i, lit(tag)), lit(20000)))))
    def batchOf(b: Long) = spark.range(docsPerBatch)
      .select((col("id") + b * docsPerBatch).as("doc_id"),
        // ~2 % of each batch duplicates an earlier doc word-for-word
        when(pmod(col("id"), lit(50)) === 0 && lit(b) > 0,
          text(pmod(col("id"), lit(docsPerBatch)), "c0"))
          .otherwise(text(col("id") + b * docsPerBatch, s"c$b")).as("text"))

    val work = java.nio.file.Files.createTempDirectory("dedup-compact-bench")
    val rootA = work.resolve("a/idx").toString
    val rootB = work.resolve("b/idx").toString

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var (first, mid, last) = (0.0, 0.0, 0.0)
    (0 until nBatches).foreach { b =>
      val sec = timed {
        DedupIndexSink.maintain(spark, batchOf(b), rootA, "doc_id", "text",
          b.toLong).count(): Unit
      }
      if (b == 0) first = sec
      if (b == nBatches / 2) mid = sec
      if (b == nBatches - 1) last = sec
    }

    // clone A → B on the local fs, compact the clone only
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(rootA).getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(work.resolve("a").toString), fs,
      new org.apache.hadoop.fs.Path(work.resolve("b").toString), false, conf)
    DedupIndexSink.compact(spark, rootB)

    def counts(root: String): (Int, Int) = {
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try {
        val all = it.iterator()
        var dirs = 0; var files = 0
        while (all.hasNext) {
          val p = all.next()
          if (java.nio.file.Files.isDirectory(p)) dirs += 1
          else if (p.getFileName.toString.endsWith(".parquet")) files += 1
        }
        (dirs, files)
      } finally it.close()
    }
    val (dirA, fileA) = counts(rootA)
    val (dirB, fileB) = counts(rootB)

    // identical fresh probe batch, same id, against both layouts.
    // Warm BOTH roots with one extra committed batch first: codegen/JIT
    // costs land on neither measured probe, and both indexes hold the
    // identical document set when measured (B = generation + one tail
    // dir, the realistic post-compaction shape).
    DedupIndexSink.maintain(spark, batchOf(900000L), rootA, "doc_id",
      "text", 900000L).count()
    DedupIndexSink.maintain(spark, batchOf(900000L), rootB, "doc_id",
      "text", 900000L).count()
    val probe = batchOf(900001L).persist(); probe.count()
    val tA = timed { DedupIndexSink.maintain(spark, probe, rootA,
      "doc_id", "text", 900001L).count(): Unit }
    val tB = timed { DedupIndexSink.maintain(spark, probe, rootB,
      "doc_id", "text", 900001L).count(): Unit }

    println(s"""{"metric":"dedup_compact","batches":$nBatches,""" +
      s""""docs_per_batch":$docsPerBatch,"build_first_sec":$first,""" +
      s""""build_mid_sec":$mid,"build_last_sec":$last,""" +
      s""""probe_uncompacted_sec":$tA,"probe_compacted_sec":$tB,""" +
      s""""dirs_uncompacted":$dirA,"dirs_compacted":$dirB,""" +
      s""""files_uncompacted":$fileA,"files_compacted":$fileB}""")
    spark.stop()
  }
}
