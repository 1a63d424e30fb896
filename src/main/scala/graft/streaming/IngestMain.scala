package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession

/** The application entry point — the reference's `python run.py` CLI
  * (`run.py:134-264`, O25) as a spark-submit main.
  *
  * Arguments are `key=value` pairs:
  *
  * {{{
  * spark-submit --class graft.streaming.IngestMain app.jar \
  *   source=kafka bootstrap=broker:9092 \
  *   topics=cuip_vision_events,MLK_AIR_QUALITY \
  *   root=s3a://bucket/lake checkpoint=s3a://bucket/ckpt \
  *   mode=drain
  * }}}
  *
  * `mode=drain` is the reference's CRON catch-up operating model
  * (`README.md:35`, Trigger.AvailableNow: process everything, exit);
  * `mode=daemon interval="10 seconds"` runs continuously. The reference's
  * AWS env-var validation (`run.py:224-248`) is subsumed by
  * `spark.hadoop.fs.s3a.*` configuration.
  *
  * `source=dir:<path>` streams `{"topic": ..., "value": ...}` JSON files
  * from a directory through the identical decode/route/sink path — the
  * broker-less way to run (and verify) the whole app end-to-end.
  */
object IngestMain {

  def parseArgs(args: Array[String]): Map[String, String] =
    args.iterator.map { a =>
      a.split("=", 2) match {
        case Array(k, v) => k -> v
        case _ => throw new IllegalArgumentException(s"expected key=value, got: $a")
      }
    }.toMap

  /** Build the (topic, value) source stream from the `source=` arg. */
  def source(spark: SparkSession, conf: Map[String, String]): DataFrame =
    conf.getOrElse("source", "kafka") match {
      case "kafka" =>
        IngestPipeline.kafkaSource(
          spark,
          conf.getOrElse("bootstrap", "localhost:9092"),
          conf.getOrElse("topics", graft.schemas.TopicSchemas.visionTopic).split(",").toSeq,
          conf.getOrElse("maxOffsetsPerTrigger", "100000").toLong)
      case dir if dir.startsWith("dir:") =>
        spark.readStream
          .schema("topic STRING, value STRING")
          .json(dir.stripPrefix("dir:"))
      case other =>
        throw new IllegalArgumentException(s"unknown source: $other")
    }

  def main(args: Array[String]): Unit = {
    val conf = parseArgs(args)
    val root = conf.getOrElse("root",
      throw new IllegalArgumentException("root=<lake path> is required"))
    val checkpoint = conf.getOrElse("checkpoint",
      throw new IllegalArgumentException("checkpoint=<path> is required"))

    val spark = GraftSession.configure(
      SparkSession.builder().appName("graft-ingest").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    val stream = source(spark, conf)
      .selectExpr("CAST(topic AS STRING) AS topic", "CAST(value AS STRING) AS value")

    val query = IngestPipeline.writer(
      stream, root, checkpoint,
      availableNow = conf.getOrElse("mode", "drain") == "drain",
      interval = conf.getOrElse("interval", "10 seconds"),
      format = conf.getOrElse("format", "parquet")).start()

    // the reference's SIGINT flush intent (run.py:126-131) without its
    // leak: stop() checkpoints the in-flight batch; replay is idempotent
    sys.addShutdownHook {
      if (query.isActive) query.stop()
    }
    query.awaitTermination()
    spark.stop()
  }
}
