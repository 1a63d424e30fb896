package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bigram-extraction crossover benchmark: lead()-window pairing (one
  * full token-stream shuffle by doc before anything aggregates) vs
  * [[graft.operators.Corpus.bigramSurprisal]]'s map-side array-shift
  * (`slice` × 2 + `arrays_zip` inside the scan's projection — zero
  * extraction shuffle). Both paths end in the identical
  * `groupBy(prev, cur).count` that feeds the LM model, so the delta is
  * purely the extraction strategy.
  *
  * Prints one JSON line:
  * `{"metric":"bigram_extract","docs":N,"tokens_per_doc":K,
  *   "window_sec":…,"zip_sec":…}`.
  * Recorded per round in BASELINE.md (`bigram_extract`).
  */
object BigramBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val docs = args.headOption.map(_.toLong).getOrElse(200000L)
    val toksPerDoc = args.lift(1).map(_.toInt).getOrElse(100)
    // synthetic corpus: 1000-word vocabulary, deterministic per doc —
    // generation cost is shared by both paths and amortized by warming
    val corpus = spark.range(docs).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(toksPerDoc)),
          i => concat(lit("w"), pmod(hash(col("id") * toksPerDoc + i), lit(1000)))))
          .as("text"))
      .persist()
    corpus.count()

    val whitespace = graft.functions.TextFunctions.whitespaceClass

    // (a) window-lag pairing: posexplode the token stream, shuffle it ALL
    // by doc_id, sort within doc, lead(1) — the "obvious" formulation
    def windowPlan: DataFrame = {
      val toks = corpus.select(col("doc_id"),
        posexplode(split(trim(col("text")), whitespace)).as(Seq("pos", "token")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      toks.withColumn("__next", lead(col("token"), 1).over(w))
        .filter(col("__next").isNotNull)
        .groupBy(col("token").as("prev"), col("__next").as("cur"))
        .agg(count(lit(1)).as("cbg"))
    }

    // (b) map-side zip: shifted slices zipped in the scan's own
    // projection; the first shuffle anywhere is the partial-aggregated
    // bigram count itself
    def zipPlan: DataFrame = {
      val tk = split(trim(col("text")), whitespace)
      corpus.select(col("doc_id"), tk.as("__tk"))
        .filter(size(col("__tk")) >= 2)
        .select(
          slice(col("__tk"), lit(1), size(col("__tk")) - 1).as("p"),
          slice(col("__tk"), lit(2), size(col("__tk")) - 1).as("c"))
        .select(explode(arrays_zip(col("p"), col("c"))).as("b"))
        .groupBy(col("b").getField("p").as("prev"), col("b").getField("c").as("cur"))
        .agg(count(lit(1)).as("cbg"))
    }

    def time(f: => DataFrame): Double = {
      f.write.format("noop").mode("overwrite").save() // warm: codegen + JIT
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val tw = time(windowPlan)
    val tz = time(zipPlan)
    println(s"""{"metric":"bigram_extract","docs":$docs,""" +
      s""""tokens_per_doc":$toksPerDoc,"window_sec":$tw,"zip_sec":$tz}""")
    spark.stop()
  }
}
