package graft


/** Driver-run benchmark: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Per-query protocol (round 11 — isolation over throughput; round 15
  * — sub-second densification): warm once untimed (JIT + codegen +
  * parquet footer caches — the steady-state a long-running cluster
  * operates in), time three passes — five when the 3-pass minimum is
  * under 1 s, where fixed noise is a large fraction of the number —
  * then DROP all cached blocks and force a GC before the next query.
  * The old shape (one global warmup building all 179 queries' caches
  * up front, cleanup left to the ContextCleaner) accumulated
  * block-manager state no real deployment would carry, and neighbors'
  * timings drifted 2-3× under the leftover GC pressure — per-query
  * deltas across rounds were untrustworthy. Reported: min of passes
  * (the steady-state cost) plus median (`queries_median`) so a
  * min/median gap flags in-JVM variance explicitly instead of
  * masquerading as a regression. Cross-round comparisons should lead
  * with `queries_median` for sub-second queries.
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

    // optional local-iteration filter (the driver never sets it):
    // SPARK_GRAFT_BENCH_ONLY=q122,q106 times just those queries in a
    // fresh JVM — the standalone control for per-query numbers
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(names => names.exists(kv._1.startsWith)))
    // min-of-3, raised to min-of-5 for sub-second queries (round 15):
    // a single timed pass lets one GC pause / JIT recompile /
    // page-cache miss read as a multi-x regression in the per-round
    // artifact; the minimum of the passes is the steady-state cost and
    // is stable across reruns. Sub-second queries are where fixed
    // noise (one GC pause ≈ 100-500 ms) is a large FRACTION of the
    // measurement — the round-14 same-binary runs disagreed 2× on ~10
    // of them — so when the 3-pass minimum lands under 1 s the query
    // earns two more passes; min/median then come from all 5. The two
    // extra passes cost < 2 s each by construction, so the suite-level
    // overhead is bounded while the artifact's run-to-run spread on
    // the cheap tail tightens. Errors still red every pass they hit.
    val results = ordered.map { case (name, fn) =>
      errors.remove(name) // timed passes re-record; warmup failures repeat
      run(name, fn)       // this query's own warm pass, nothing else's
      def pass(): Double = {
        val t0 = System.nanoTime()
        run(name, fn)
        (System.nanoTime() - t0) / 1e9
      }
      val first3 = (1 to 3).map(_ => pass())
      val times = (if (first3.min < 1.0) first3 ++ (1 to 2).map(_ => pass())
                   else first3).sorted
      // isolation boundary: drop every cached block this query left
      // (operator-internal persists, memoized index frames) and reap
      // dead references NOW — the next query starts from the same
      // clean slate a standalone run would
      spark.catalog.clearCache()
      System.gc()
      (name, times.head, times(times.length / 2))
    }
    // 3-decimal timings: ms resolution is all the comparison needs, and
    // the halved line length keeps the whole JSON inside log tail
    // windows that previously truncated the artifact mid-line
    def d3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + d3(v) }
      .mkString("{", ",", "}")
    val qsMed = results.map { case (k, _, m) => "\"" + k + "\":" + d3(m) }
      .mkString("{", ",", "}")
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // whole-run GC seconds: the round-15 heap finding (multi-second
    // full collections masquerading as query regressions) made GC time
    // a first-class artifact column — a run whose gc_sec is a large
    // fraction of value is a machine-conditions run, not a code signal
    val gcSec = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum / 1000.0
    }
    val json = s"""{"metric":"total","value":${d3(total)},"unit":"sec","error_count":${errors.size},""" +
      s""""gc_sec":${d3(gcSec)},"errors":$errJson,"queries":$qs,"queries_median":$qsMed,"sf":"$sfDir"}"""
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
