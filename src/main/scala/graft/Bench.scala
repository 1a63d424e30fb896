package graft


/** Driver-run benchmark: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Each query is executed once untimed (JIT + codegen compilation,
  * parquet footer/metadata caches — the steady-state a long-running
  * cluster actually operates in) and then timed three times, reporting
  * the minimum. Queries run in sorted name order so timings are
  * attributable and stable across runs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    // noop-sink write: unlike count() (which lets Catalyst collapse
    // count-over-project and skip projected work entirely), the noop
    // datasource consumes every output row and column, so projection-only
    // queries are measured end to end.
    // A query that throws must RED the bench, not record a near-zero time
    // that reads as fast — failures are collected and emitted in the JSON.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def run(name: String,
            fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}"
      }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // warmup pass: codegen + file-metadata caches, not the data itself
    ordered.foreach { case (name, fn) => run(name, fn) }
    errors.clear() // timed pass re-records; warmup failures usually repeat
    // min-of-3: a single timed pass lets one GC pause / JIT recompile /
    // page-cache miss read as a multi-x regression in the per-round
    // artifact; the minimum of three passes is the steady-state cost and
    // is stable across reruns. Errors still red every pass they hit.
    val results = ordered.map { case (name, fn) =>
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run(name, fn)
        (System.nanoTime() - t0) / 1e9
      }.min
      // between queries (outside the timed region): let the
      // ContextCleaner reap the previous query's dead persist /
      // checkpoint blocks — 151 queries in one JVM otherwise
      // accumulate block-manager state no real deployment would carry,
      // and neighbors' timings degrade under the leftover GC pressure
      System.gc()
      name -> t
    }
    // 3-decimal timings: ms resolution is all the comparison needs, and
    // the halved line length keeps the whole JSON inside log tail
    // windows that previously truncated the artifact mid-line
    def d3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + d3(v) }
      .mkString("{", ",", "}")
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":${d3(total)},"unit":"sec","error_count":${errors.size},""" +
      s""""errors":$errJson,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // belt-and-braces artifact: the same line on disk survives any tail
    // window (overridable so a read-only CWD can't fail the bench)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
