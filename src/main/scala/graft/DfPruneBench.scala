package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Apply-stage crossover for df-cap pruning: the composed
  * `filter(tk, t -> !array_contains(lit(stop), t))` runs its lambda
  * interpreted and scans the stop literal linearly PER TOKEN —
  * O(|tokens|·|stop|) interpreted comparisons per document — while
  * [[graft.functions.StringArrayExceptSet]] makes one hashed pass.
  * Both plans tokenize identically and reduce to the same checksum
  * (`sum(size(kept))`), so the delta is purely the membership strategy.
  *
  * Prints one JSON line:
  * `{"metric":"df_prune","docs":N,"stop_words":S,"hof_sec":…,"expr_sec":…}`.
  * Recorded per round in BASELINE.md (`df_prune`).
  */
object DfPruneBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val docs = args.headOption.map(_.toLong).getOrElse(500000L)
    val stopWords = args.lift(1).map(_.toInt).getOrElse(300)
    val toksPerDoc = 40
    // vocab 2000; the stop set is the first `stopWords` words — dense
    // enough that the filter actually drops tokens in every document
    val corpus = spark.range(docs).select(col("id").as("doc_id"),
        split(concat_ws(" ", transform(sequence(lit(1), lit(toksPerDoc)),
          i => concat(lit("w"), pmod(hash(col("id") * toksPerDoc + i), lit(2000))))),
          " ").as("tk"))
      .persist()
    corpus.count()
    val stop = Array.tabulate(stopWords)(i => s"w$i")
    val stopLit = typedlit(stop)

    def hofPlan: DataFrame = corpus
      .select(filter(col("tk"), t => !array_contains(stopLit, t)).as("kept"))
      .agg(sum(size(col("kept"))).as("n"))
    def exprPlan: DataFrame = corpus
      .select(ColumnBridge.column(graft.functions.StringArrayExceptSet(
        ColumnBridge.expression(col("tk")), stop)).as("kept"))
      .agg(sum(size(col("kept"))).as("n"))

    def time(f: => DataFrame): Double = {
      val warm = f.head().getLong(0) // warm: codegen + JIT
      val t0 = System.nanoTime()
      val v = f.head().getLong(0)
      require(v == warm, "non-deterministic checksum")
      (System.nanoTime() - t0) / 1e9
    }
    val th = time(hofPlan)
    val tx = time(exprPlan)
    require(hofPlan.head().getLong(0) == exprPlan.head().getLong(0),
      "strategies disagree")
    println(s"""{"metric":"df_prune","docs":$docs,"stop_words":$stopWords,""" +
      s""""hof_sec":$th,"expr_sec":$tx}""")
    spark.stop()
  }
}
