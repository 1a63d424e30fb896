package graft

/** Optimization-round tooling: dump `.explain("formatted")` for named
  * registry queries to files — the plan evidence the optimization
  * deliverables commit (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Usage: `graft.PlanDump <outDir> <suffix> [q1,q2,...]` with the data
  * dir from `SPARK_GRAFT_SF_DIR` (defaults to sf0.1). No timing, no
  * execution — plans only (AQE plans print `isFinalPlan=false`; the
  * shape — exchanges, join strategies, pushed filters — is what the
  * files are for).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val only = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
    else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
