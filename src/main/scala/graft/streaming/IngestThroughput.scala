package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Single-node ingest throughput benchmark: derives Kafka-shaped JSON
  * messages from the `events` fixture table (vision-shaped for even
  * user_ids, air-quality-shaped for odd), lands them as files, and
  * drains them through the full IngestPipeline (decode → patch → gates →
  * partitioned lake) with Trigger.AvailableNow — the reference's CRON
  * catch-up run, measured.
  *
  * The reference's only published number is "catch-up finishes in ~1 hr"
  * on a 6C/12T laptop (`README.md:35`); this prints messages/second for
  * the same operating mode so the comparison is direct.
  */
object IngestThroughput {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val in = Files.createTempDirectory("graft_tp_in_").toString
    val lake = Files.createTempDirectory("graft_tp_lake_").toString
    val ckpt = Files.createTempDirectory("graft_tp_ck_").toString

    // derive the message stream from the fixture events
    val ev = Tables.events(spark, sfDir).filter(col("ts").isNotNull)
    val vision = ev.filter(col("user_id") % 2 === 0).select(
      lit(graft.schemas.TopicSchemas.visionTopic).as("topic"),
      to_json(struct(
        unix_millis(col("ts")).as("timestamp"),
        concat(lit("cam"), col("user_id")).as("camera_id"),
        array(struct(col("value").as("x"), col("value").as("y"),
          col("event_type").as("label"))).as("locations"))).as("value"))
    val aq = ev.filter(col("user_id") % 2 === 1).select(
      lit("BENCH_AIR_QUALITY").as("topic"),
      to_json(struct(
        unix_millis(col("ts")).as("timestamp"),
        concat(lit("site"), col("user_id")).as("nicename"),
        col("value").as("pm25"))).as("value"))
    val messages = vision.unionByName(aq)
    messages.write.mode("overwrite").json(in)
    val n = spark.read.json(in).count() // materialized message count

    val t0 = System.nanoTime()
    val stream = spark.readStream.schema("topic STRING, value STRING").json(in)
    IngestPipeline.writer(stream, lake, ckpt, availableNow = true)
      .start().awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9

    val landed = spark.read.parquet(s"$lake/vision").count() +
      spark.read.parquet(s"$lake/air_quality").count()
    println(f"""{"metric":"ingest_throughput","messages":$n,"landed":$landed,"seconds":$secs%.2f,"msg_per_sec":${n / secs}%.0f}""")
    spark.stop()
  }
}
