package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The honest comparison behind the round-10 ROW-LOCAL scoring family
  * ([[graft.operators.Corpus.dsirScoreRowWise]],
  * [[graft.operators.QualityClassifier.scoreRowWise]],
  * [[graft.operators.NaiveBayes.nbClassify]]): folding the token array
  * against a frozen score-map literal per row (zero exchanges) versus
  * the obvious alternative — explode tokens, shuffle-join a
  * bucket-score table, re-aggregate per document (two data-scale
  * exchanges). Same integers out of both; the table prices the
  * difference as corpus size grows.
  *
  * Prints one JSON line per size:
  * `{"metric":"rowlocal_score","docs":N,"rowlocal_sec":…,"join_sec":…}`.
  * Recorded in BASELINE.md (`rowlocal_score`).
  */
object ScoreScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Corpus, QualityClassifier}

    val dim = 256
    // deterministic synthetic docs: ~40 tokens from a 10k-word vocab
    def corpus(n: Long): DataFrame = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(k =>
        concat(lit("w"), pmod(hash(col("id") * 41L + k), lit(10000)))): _*)
        .as("text"))

    // a frozen score map (values don't matter for cost; reuse DSIR's)
    val seed = corpus(2000)
    val su = Corpus.dsirScoreMap(
      seed, seed.filter(col("doc_id") % 7 === 0), "text", dim)
    val suDf = spark.createDataFrame(
      su.toSeq.map { case (j, u) => (j, u) }).toDF("j", "u")

    def joinScore(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
        .select(col("doc_id"),
          QualityClassifier.featureBucket(col("tok"), dim).as("j"))
        .join(suDf, "j") // Spark may broadcast the 256-row side; the
        // explode + per-doc re-aggregation are the data-scale cost
        .groupBy("doc_id").agg(sum(col("u")).as("logw_units"))

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(2000000L, 8000000L)) {
      val docs = corpus(n).persist()
      docs.count()
      val rl = Corpus.dsirScoreRowWise(docs, "doc_id", "text", su, dim)
      val js = joinScore(docs)
      // equality first (integers must agree), then steady-state timing
      val a = rl.agg(sum(col("logw_units"))).head().getLong(0)
      val b = js.agg(sum(col("logw_units"))).head().getLong(0)
      require(a == b, s"row-local and join scoring disagree: $a vs $b")
      val tRl = (1 to 2).map(_ => time(rl.agg(sum(col("logw_units"))).head().getLong(0))).min
      val tJs = (1 to 2).map(_ => time(js.agg(sum(col("logw_units"))).head().getLong(0))).min
      println(f"""{"metric":"rowlocal_score","docs":$n,"rowlocal_sec":$tRl%.2f,"join_sec":$tJs%.2f}""")
      docs.unpersist()
    }
    spark.stop()
  }
}
