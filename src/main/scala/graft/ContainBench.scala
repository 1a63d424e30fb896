package graft

import org.apache.spark.sql.functions._

/** Candidate-generation economics of the asymmetric CONTAINMENT join
  * ([[graft.operators.Dedup.containmentJoinPrefix]]) — the
  * [[SetSimBench]] companion: the asymmetric variant probes with A's
  * prefix against B's FULL postings, so its candidate set is larger
  * than the symmetric prefix⋈prefix join's; the number that matters is
  * how far it still sits below the n·(n−1) ordered pairs a brute scan
  * would verify, and the wall cost of each strategy with the same
  * result.
  *
  * Prints one JSON line:
  * `{"metric":"containment","docs":N,"all_ordered_pairs":…,
  *   "prefix_candidates":…,"result_pairs":…,"prefix_sec":…,
  *   "brute_sec":…}`. Recorded in BASELINE.md (`containment`).
  */
object ContainBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .persist()
    val n = docs.count()

    val num = 7; val den = 10
    def prefixJoin = graft.operators.Dedup.containmentJoinPrefix(
      docs, "doc_id", "text", thresholdNum = num, thresholdDen = den)

    // brute force: every ORDERED id pair, same exact verify arithmetic
    def brute = {
      val sh = docs.select(col("doc_id"),
          graft.functions.HashFunctions.hashedWordNgrams(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      val a = sh.select(col("doc_id").as("a_id"), col("sh").as("sa"))
      val b = sh.select(col("doc_id").as("b_id"), col("sh").as("sb"))
      a.join(b, col("a_id") =!= col("b_id"))
        .withColumn("inter", graft.functions.HashFunctions
          .sortedLongIntersectSize(col("sa"), col("sb")).cast("long"))
        .withColumn("sz_a", size(col("sa")).cast("long"))
        .filter(col("inter") * den >= col("sz_a") * num)
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

    val candidates = graft.operators.Dedup
      .containmentPrefixCandidates(docs, "doc_id", "text", num, den).count()

    println(s"""{"metric":"containment","docs":$n,"all_ordered_pairs":${n * (n - 1)},""" +
      s""""prefix_candidates":$candidates,"result_pairs":$resultPairs,""" +
      s""""prefix_sec":$tp,"brute_sec":$tb}""")
    spark.stop()
  }
}
