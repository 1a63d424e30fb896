package graft

import org.apache.spark.sql.functions._

/** Scale evidence for [[graft.operators.Graph.pageRank]]: its scaladoc
  * claims one rank-scale join + one BIGINT aggregate per iteration —
  * linear in edges. This main MEASURES wall and shuffle bytes for the
  * full 5-iteration run on a deterministic synthetic graph at two edge
  * counts so the claim is a recorded ratio, not an assertion.
  *
  * The generator is a hash-mixed multigraph over `edges/10` nodes with
  * a skewed in-degree (every 13th edge targets one of 100 hub nodes —
  * the shape that breaks naive per-node grouping if contributions
  * didn't partial-aggregate map-side). Deterministic in the edge id —
  * reruns measure the same graph.
  *
  * Prints one JSON line per size:
  * `{"metric":"pagerank_scale","edges":N,"nodes":…,"sec":…,
  *   "shuffle_mb":…}`. Recorded in BASELINE.md (`pagerank_scale`).
  */
object GraphScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(2000000L, 8000000L)

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    sizes.foreach { edges =>
      val nodes = edges / 10
      val e = spark.range(edges).select(
        pmod(hash(col("id") * 2654435761L), lit(nodes)).as("src"),
        when(pmod(col("id"), lit(13)) === 0, pmod(hash(col("id")), lit(100)))
          .otherwise(pmod(hash(col("id") + 7919L), lit(nodes))).as("dst"))
      // warm (codegen + the generator itself), then measure steady state
      def run() = graft.operators.Graph.pageRank(e, "src", "dst", iterations = 5)
        .write.format("noop").mode("overwrite").save()
      run()
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      run()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"pagerank_scale","edges":$edges,"nodes":$nodes,""" +
        f""""sec":$sec%.3f,"shuffle_mb":${shuffleBytes.get() / 1048576.0}%.1f}""")
    }

    // lineage control: per-iteration wall must stay FLAT as iteration
    // count grows — localCheckpoint cuts the plan every 8 rounds, so 20
    // iterations cost ~4x 5 iterations, not an analyzer blow-up
    val edges = sizes.head
    val nodes = edges / 10
    val e = spark.range(edges).select(
      pmod(hash(col("id") * 2654435761L), lit(nodes)).as("src"),
      when(pmod(col("id"), lit(13)) === 0, pmod(hash(col("id")), lit(100)))
        .otherwise(pmod(hash(col("id") + 7919L), lit(nodes))).as("dst"))
    Seq(5, 20).foreach { iters =>
      def run() = graft.operators.Graph.pageRank(e, "src", "dst",
          iterations = iters)
        .write.format("noop").mode("overwrite").save()
      run()
      val t0 = System.nanoTime()
      run()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"pagerank_iters","edges":$edges,"iters":$iters,""" +
        f""""sec":$sec%.3f,"sec_per_iter":${sec / iters}%.3f}""")
    }

    // HITS: each half-step references its predecessor twice, so the
    // per-iteration lineage cut is what keeps per-iteration wall flat
    // (an uncut plan TREE is 4^iters) — measured the same way
    Seq(3, 12).foreach { iters =>
      def run() = graft.operators.Graph.hits(e, "src", "dst",
          iterations = iters)
        .write.format("noop").mode("overwrite").save()
      run()
      val t0 = System.nanoTime()
      run()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"hits_iters","edges":$edges,"iters":$iters,""" +
        f""""sec":$sec%.3f,"sec_per_iter":${sec / iters}%.3f}""")
    }
    spark.stop()
  }
}
