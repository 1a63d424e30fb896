package graft

import org.apache.spark.sql.functions._

/** Candidate-generation economics of the EXACT set-similarity join
  * ([[graft.operators.Dedup.setSimJoinPrefix]]): prefix filtering
  * exists to replace the all-pairs verify, so the number that matters
  * is how many candidate pairs reach exact verification versus the
  * n·(n−1)/2 a brute-force scan would verify — and the wall cost of
  * each strategy on the same corpus with the same result.
  *
  * Prints one JSON line:
  * `{"metric":"setsim","docs":N,"all_pairs":…,"prefix_candidates":…,
  *   "result_pairs":…,"prefix_sec":…,"brute_sec":…}`.
  * Recorded in BASELINE.md (`setsim`).
  */
object SetSimBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .persist()
    val n = docs.count()

    // candidate count: the prefix join's distinct pair table, measured
    // with the same parameters the timed run uses
    val num = 1; val den = 2
    def prefixJoin = graft.operators.Dedup.setSimJoinPrefix(
      docs, "doc_id", "text", thresholdNum = num, thresholdDen = den)

    // brute force: every id pair, same exact verify arithmetic
    def brute = {
      val sh = docs.select(col("doc_id"),
          graft.functions.HashFunctions.hashedWordNgrams(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      val a = sh.select(col("doc_id").as("a_id"), col("sh").as("sa"))
      val b = sh.select(col("doc_id").as("b_id"), col("sh").as("sb"))
      a.join(b, col("a_id") < col("b_id"))
        .withColumn("inter", graft.functions.HashFunctions
          .sortedLongIntersectSize(col("sa"), col("sb")).cast("long"))
        .withColumn("un", (size(col("sa")) + size(col("sb"))).cast("long") - col("inter"))
        .filter(col("un") > 0 && col("inter") * den >= col("un") * num)
        .select("a_id", "b_id")
    }

    def time(f: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val warm = f.count()
      val t0 = System.nanoTime()
      val c = f.count()
      require(c == warm, "non-deterministic result")
      ((System.nanoTime() - t0) / 1e9, c)
    }
    val (tp, resultPairs) = time(prefixJoin)
    val (tb, brutePairs) = time(brute)
    require(resultPairs == brutePairs,
      s"exact join must equal brute force: $resultPairs vs $brutePairs")

    // candidate pairs the prefix join actually verified (re-derived with
    // the operator's own machinery: distinct (a,b) sharing a prefix hash
    // within the length filter) — reported, not timed
    val candidates = graft.operators.Dedup
      .setSimPrefixCandidates(docs, "doc_id", "text", num, den).count()

    println(s"""{"metric":"setsim","docs":$n,"all_pairs":${n * (n - 1) / 2},""" +
      s""""prefix_candidates":$candidates,"result_pairs":$resultPairs,""" +
      s""""prefix_sec":$tp,"brute_sec":$tb}""")
    spark.stop()
  }
}
