package graft

import org.apache.spark.sql.functions._

/** Per-batch cost of the maintained vocabulary as the standing table
  * grows — [[graft.sinks.VocabSink]]'s O(touched vocabulary) claim,
  * measured. Each batch carries the same document count; the Heaps-law
  * vocabulary grows sublinearly, and the fold rewrites only the
  * (lang, bucket) cells the batch touches, so per-batch wall should
  * stay near-flat while the CUMULATIVE corpus grows N×. The probe leg
  * (OOV of a fixed slice) reads the standing table only, so its cost
  * tracks the vocabulary, not the corpus.
  *
  * Prints one JSON line:
  * `{"metric":"vocab_scale","batches":N,"docs_per_batch":D,
  *   "first_sec":…,"mid_sec":…,"last_sec":…,
  *   "probe_first_sec":…,"probe_last_sec":…,"vocab_rows":V}`.
  * Recorded in BASELINE.md (`vocab_scale`).
  */
object VocabScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val nBatches = args.headOption.map(_.toInt).getOrElse(24)
    val docsPerBatch = args.lift(1).map(_.toLong).getOrElse(2000L)
    val toksPerDoc = 40
    // Zipf-ish token mix: low ids recur across batches (head mass),
    // the hash tail mints fresh types every batch (Heaps growth)
    def text(idExpr: org.apache.spark.sql.Column, tag: String) =
      concat_ws(" ", transform(sequence(lit(1), lit(toksPerDoc)),
        i => concat(lit("w"), pmod(hash(idExpr * toksPerDoc + i, lit(tag)),
          lit(60000)))))
    def batchOf(b: Long) = spark.range(docsPerBatch)
      .select((col("id") + b * docsPerBatch).as("doc_id"))
      .withColumn("lang", concat(lit("l"), pmod(col("doc_id"), lit(4))))
      .withColumn("text", text(col("doc_id"), s"b$b"))
    val probe = batchOf(999L)

    val work = java.nio.file.Files.createTempDirectory("vocab-scale")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm code paths so JIT/codegen cost lands outside the run
    val warm = work.resolve("warm/v").toString
    (0 until 2).foreach(b =>
      graft.sinks.VocabSink.maintain(spark, batchOf(b.toLong), warm,
        "lang", "text", b.toLong))
    graft.sinks.VocabSink.oovRate(spark, warm, probe, "lang", "text")
      .count()

    val root = work.resolve("run/v").toString
    var (first, mid, last) = (0.0, 0.0, 0.0)
    var probeFirst = 0.0
    (0 until nBatches).foreach { b =>
      val sec = timed {
        graft.sinks.VocabSink.maintain(spark, batchOf(b.toLong), root,
          "lang", "text", b.toLong): Unit
      }
      if (b == 0) {
        first = sec
        probeFirst = timed {
          graft.sinks.VocabSink.oovRate(spark, root, probe, "lang", "text")
            .count(): Unit
        }
      }
      if (b == nBatches / 2) mid = sec
      if (b == nBatches - 1) last = sec
    }
    val probeLast = timed {
      graft.sinks.VocabSink.oovRate(spark, root, probe, "lang", "text")
        .count(): Unit
    }
    val vocabRows = graft.sinks.VocabSink.read(spark, root).count()

    def r(x: Double) = math.rint(x * 1000) / 1000
    println(s"""{"metric":"vocab_scale","batches":$nBatches""" +
      s""","docs_per_batch":$docsPerBatch,"first_sec":${r(first)}""" +
      s""","mid_sec":${r(mid)},"last_sec":${r(last)}""" +
      s""","probe_first_sec":${r(probeFirst)}""" +
      s""","probe_last_sec":${r(probeLast)},"vocab_rows":$vocabRows}""")
    spark.stop()
  }
}
