package graft

import org.apache.spark.sql.functions._

/** Scale evidence for [[graft.operators.Unigram.learnUnigram]]'s
  * distributed Viterbi-EM train and the row-local apply:
  *
  *  - EM round cost: each round is ONE map-side Viterbi pass over the
  *    distributed word dict + one vocab-bounded shuffle + a ≤|vocab|-row
  *    collect — measured as the job delta between iters=1 and iters=3
  *    (constant jobs/round), and as wall-clock at 1× vs 4× distinct
  *    words (dict-linear, since the dict never collects the driver
  *    holds only the vocab histogram).
  *  - Apply throughput: [[graft.operators.Unigram.unigramStats]] is a
  *    pure projection — rows/sec at the fixture corpus scale.
  *
  * Prints one JSON line per row:
  * `{"metric":"unigram","phase":…,…,"sec":…}`. Recorded in BASELINE.md
  * (`unigram`).
  */
object UnigramBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet(); ()
      }
    })

    // the BpeLearnBench synthetic corpus: distinct words of 3-6 hashed
    // syllables over a 40-syllable alphabet, deterministic in the row id
    val syl = typedLit((for (a <- "bcdfgkmnprst"; b <- "aeiou") yield s"$a$b").take(40))
    def synth(rows: Long, distinctWords: Int) = {
      val df = spark.range(rows)
        .select(concat_ws(" ", transform(sequence(lit(1), lit(8)), i => {
          val w = pmod(hash(col("id") * 8 + i), lit(distinctWords))
          concat_ws("", transform(sequence(lit(0), pmod(w, lit(4)) + 2),
            j => element_at(syl, pmod(hash(w * 7 + j), lit(40)) + 1)))
        })).as("text")).persist()
      df.count()
      df
    }

    def measure(phase: String, extra: String)(body: => Long): Unit = {
      Thread.sleep(500)
      jobs.set(0L)
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"""{"metric":"unigram","phase":"$phase",$extra"n":$n,""" +
        f""""jobs":${jobs.get()},"sec":$sec%.2f}""")
    }

    val c1 = synth(120000L, 30000)
    val c4 = synth(480000L, 120000)

    // jobs/round: iters=3 minus iters=1 over the same corpus, halved
    measure("train_iters1", """"dict":30000,""") {
      graft.operators.Unigram.learnUnigram(c1, "text", vocabSize = 512,
        maxPieceLen = 4, iters = 1).length.toLong
    }
    measure("train_iters3", """"dict":30000,""") {
      graft.operators.Unigram.learnUnigram(c1, "text", vocabSize = 512,
        maxPieceLen = 4, iters = 3).length.toLong
    }
    // dict-linear wall-clock: 4x distinct words, same vocab
    measure("train_iters3_4x", """"dict":120000,""") {
      graft.operators.Unigram.learnUnigram(c4, "text", vocabSize = 512,
        maxPieceLen = 4, iters = 3).length.toLong
    }

    // apply throughput: train once on the fixture corpus, stats everywhere
    val docs = Tables.documents(spark, sfDir).persist()
    val nDocs = docs.count()
    val vocab = graft.operators.Unigram.learnUnigram(docs, "text",
      vocabSize = 256, maxPieceLen = 5, iters = 2)
      .map(e => (e.piece, e.costUnits)).toSeq
    val stats = graft.operators.Unigram.unigramStats(docs, "doc_id", "text",
      vocab, maxPieceLen = 5)
    stats.write.format("noop").mode("overwrite").save() // warm codegen + JIT
    measure("apply", s""""docs":$nDocs,""") {
      stats.write.format("noop").mode("overwrite").save()
      nDocs
    }
    spark.stop()
  }
}
