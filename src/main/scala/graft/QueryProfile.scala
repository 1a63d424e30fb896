package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Optimization-round tooling: empirical decomposition of one registry
  * query (guide §1 — measure first). Runs the query through the noop
  * sink `passes` times after one warm pass, with a listener recording
  * per-stage wall clock, task counts, and shuffle bytes, then prints a
  * per-stage table for the LAST pass plus the pass wall times.
  *
  * Usage: `graft.QueryProfile <name> [passes]`, data dir from
  * `SPARK_GRAFT_SF_DIR`, cores from `SPARK_GRAFT_CPUS`.
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)

    case class StageRow(id: Int, name: String, tasks: Int, wallMs: Long,
                        taskMs: Long, shufReadMB: Double, shufWriteMB: Double,
                        inMB: Double, recs: Long)
    val stages = mutable.ArrayBuffer[StageRow]()
    val jobEnds = mutable.ArrayBuffer[(Int, Long)]()
    val listener = new SparkListener {
      private val starts = mutable.Map[Int, Long]()
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        starts(e.stageInfo.stageId) = System.nanoTime()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = starts.get(si.stageId)
          .map(t0 => (System.nanoTime() - t0) / 1000000L).getOrElse(-1L)
        val m = si.taskMetrics
        stages += StageRow(si.stageId,
          si.name.split("\n").head.take(90), si.numTasks, wall,
          m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead / 1048576.0,
          m.shuffleWriteMetrics.bytesWritten / 1048576.0,
          m.inputMetrics.bytesRead / 1048576.0,
          m.outputMetrics.recordsWritten)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobEnds += ((e.jobId, System.nanoTime()))
    }

    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm
    spark.catalog.clearCache(); System.gc()
    spark.sparkContext.addSparkListener(listener)
    val walls = (1 to passes).map { i =>
      if (i == passes) { stages.clear(); jobEnds.clear() }
      val w = once()
      if (i < passes) { spark.catalog.clearCache(); System.gc() }
      w
    }
    spark.sparkContext.removeSparkListener(listener)
    println(f"== $name: passes ${walls.map(w => f"$w%.3f").mkString(", ")} s")
    println(f"== last pass: ${stages.size} stages, ${jobEnds.size} jobs")
    println(f"${"stage"}%5s ${"tasks"}%5s ${"wallMs"}%7s ${"taskMs"}%7s " +
      f"${"inMB"}%8s ${"shRdMB"}%8s ${"shWrMB"}%8s  name")
    stages.sortBy(-_.wallMs).foreach { r =>
      println(f"${r.id}%5d ${r.tasks}%5d ${r.wallMs}%7d ${r.taskMs}%7d " +
        f"${r.inMB}%8.2f ${r.shufReadMB}%8.2f ${r.shufWriteMB}%8.2f  ${r.name}")
    }
    spark.stop()
  }
}
