package graft

import org.apache.spark.sql.functions._

/** Storage-layout measurement: how much parquet compression is won by
  * CONTENT-SIMILARITY ordering at write time. At 100 TB the corpus is
  * written once and scanned thousands of times, so bytes-on-disk is a
  * first-class cost; parquet compresses page-locally, and near-dup /
  * shared-boilerplate documents only help each other when they land in
  * the SAME row groups. Three layouts of the same sf0.1 documents
  * table:
  *
  *   - `arrival`  — doc_id order (the ingest order);
  *   - `shuffled` — md5(doc_id) order (the worst case: similarity
  *     scattered uniformly — what a naive repartition produces);
  *   - `simsort`  — ordered by the normalized-text sort key (the q206
  *     sorted-neighborhood key, full length): near-identical documents
  *     become page neighbors.
  *
  * All three write with the same codec/row-group settings and ONE
  * output file (layout is the only variable; `repartition(1)` +
  * within-partition sort). Prints one JSON line
  * `{"metric":"layout_compress","rows":N,"arrival_mb":…,"shuffled_mb":…,
  * "simsort_mb":…,"simsort_vs_arrival":r}` — recorded in BASELINE.md
  * (`layout_compress`).
  */
object LayoutCompressBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, sfDir)
    val rows = docs.count()

    val base = java.nio.file.Files.createTempDirectory("layoutc").toString
    def bytesOf(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(new java.io.File(dir))
    }
    def write(tag: String, ordered: org.apache.spark.sql.DataFrame): Long = {
      val dir = s"$base/$tag"
      ordered.coalesce(1).write.mode("overwrite").parquet(dir)
      bytesOf(dir)
    }
    // sortWithinPartitions after coalesce(1) = one totally-ordered file;
    // the column set is identical across layouts
    val cols = docs.columns.map(col).toIndexedSeq
    val arrival = write("arrival",
      docs.coalesce(1).sortWithinPartitions(col("doc_id")))
    val shuffled = write("shuffled", docs
      .withColumn("__o", md5(col("doc_id").cast("string")))
      .coalesce(1).sortWithinPartitions(col("__o")).select(cols: _*))
    // the simsort legs go through the first-class writer — the bench
    // measures the operator a user actually calls, not a bench-local
    // ordering recipe
    graft.sinks.Layout.similarityOrdered(docs, "text", s"$base/simsort",
      nFiles = 1)
    val simsort = bytesOf(s"$base/simsort")

    def mb(b: Long): String = f"${b / 1048576.0}%.1f"
    val ratio = f"${simsort.toDouble / arrival}%.3f"
    println(s"""{"metric":"layout_compress","corpus":"sf_documents","rows":$rows,""" +
      s""""arrival_mb":${mb(arrival)},"shuffled_mb":${mb(shuffled)},""" +
      s""""simsort_mb":${mb(simsort)},"simsort_vs_arrival":$ratio}""")

    // second corpus: near-dup-heavy (the regime the layout exists for —
    // web-scale crawls run 20-40 % near-dup mass before dedup). 40 % of
    // docs are light edits of 1/20th as many templates, ids scattered
    // so arrival order gives page locality nothing.
    val nDup = 40000L
    def body(seedExpr: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(1), lit(60)),
        i => concat(lit("w"), pmod(hash(seedExpr * 60 + i), lit(30000)))))
    val dupDocs = spark.range(nDup).select(col("id").as("doc_id"))
      .withColumn("__tpl",
        when(pmod(col("doc_id"), lit(5)) < 2,
          pmod(col("doc_id"), lit(nDup / 20)))   // 40 %: one of n/20 templates
          .otherwise(col("doc_id") + nDup))      // 60 %: unique
      .withColumn("text", concat(body(col("__tpl")),
        lit(" tail"), col("doc_id") % 7))        // light per-copy edit
      .select(col("doc_id"), col("text"))
    val dArrival = write("dup_arrival",
      dupDocs.coalesce(1).sortWithinPartitions(col("doc_id")))
    graft.sinks.Layout.similarityOrdered(dupDocs, "text",
      s"$base/dup_simsort", nFiles = 1)
    val dSim = bytesOf(s"$base/dup_simsort")
    val dRatio = f"${dSim.toDouble / dArrival}%.3f"
    println(s"""{"metric":"layout_compress","corpus":"dup40","rows":$nDup,""" +
      s""""arrival_mb":${mb(dArrival)},"simsort_mb":${mb(dSim)},""" +
      s""""simsort_vs_arrival":$dRatio}""")
    spark.stop()
  }
}
