package graft

import org.apache.spark.sql.functions._

/** Driver-round-trip evidence for [[graft.operators.Corpus.learnBpe]]'s
  * two-tier train: a production tokenizer run is tens of thousands of
  * merges, and the pre-round-11 loop issued exactly one Spark job per
  * merge — 32k driver round-trips. This main trains real merge tables
  * and MEASURES the actual Spark jobs issued (scheduler listener, not
  * an estimate), reporting jobs per merge for
  *   (a) the default local-dict tier (dict collected once, exact
  *       incremental heap trainer, zero jobs per merge),
  *   (b) the forced distributed tier (certified batch per round), and
  *   (c) the fixture documents corpus (31-word vocabulary — exhausts
  *       at ~89 merges; real-data sanity row).
  * Both tiers are bit-identical to the sequential learner (BpeSpec
  * pins them against an independent reference), so the delta is pure
  * round-trip elimination, not an approximation trade.
  *
  * Prints one JSON line per row:
  * `{"metric":"bpe_learn","tier":…,"merges":N,"jobs":J,"jobs_per_merge":…,"sec":…}`.
  * Recorded in BASELINE.md (`bpe_learn`).
  */
object BpeLearnBench {
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

    // synthetic corpus with a REAL vocabulary: ~30k distinct words of
    // 3-6 hashed syllables over a 40-syllable alphabet, zipf-ish reuse
    // via pmod collisions — deterministic in the row id
    val syl = typedLit((for (a <- "bcdfgkmnprst"; b <- "aeiou") yield s"$a$b").take(40))
    val synth = spark.range(120000L)
      .select(concat_ws(" ", transform(sequence(lit(1), lit(8)), i => {
        val w = pmod(hash(col("id") * 8 + i), lit(30000))
        concat_ws("", transform(sequence(lit(0), pmod(w, lit(4)) + 2),
          j => element_at(syl, pmod(hash(w * 7 + j), lit(40)) + 1)))
      })).as("text")).persist()
    synth.count()

    def measure(tier: String, df: org.apache.spark.sql.DataFrame, n: Int,
                dictMax: Long): Unit = {
      Thread.sleep(500) // let straggler job-end events land before reset
      jobs.set(0L)
      val t0 = System.nanoTime()
      val learned = graft.operators.Corpus.learnBpe(df, "text", n, dictMax).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val j = jobs.get()
      println(f"""{"metric":"bpe_learn","tier":"$tier","merges":$learned,""" +
        f""""jobs":$j,"jobs_per_merge":${j.toDouble / math.max(1L, learned)}%.4f,""" +
        f""""sec":$sec%.2f}""")
    }

    measure("local", synth, 1000, graft.operators.Corpus.BpeLocalDictMax)
    measure("distributed", synth, 100, 0L)
    val docs = Tables.documents(spark, sfDir).select("text").persist()
    docs.count()
    measure("fixture_local", docs, 1000, graft.operators.Corpus.BpeLocalDictMax)
    spark.stop()
  }
}
