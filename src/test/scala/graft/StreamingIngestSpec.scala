package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.IngestPipeline

/** End-to-end streaming spec: a MemoryStream plays the Kafka source
  * (same (topic, value) shape, same JSON decode path), drained with
  * Trigger.AvailableNow (the reference's CRON mode, SURVEY §3 E2), into
  * the partitioned lake — asserting routing, patching, validity gates,
  * partition layout, and dead-lettering in one pass.
  */
class StreamingIngestSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("MemoryStream -> foreachBatch -> partitioned lake, AvailableNow drain") {
    val root = Files.createTempDirectory("graft_lake_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString

    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[(String, String)]

    input.addData(
      // vision: clean with hit_counts
      ("cuip_vision_events",
        """{"timestamp": 1704067200000, "camera_id": "cam1", "locations": [{"x":1.0,"y":2.0,"label":"car"}], "hit_counts": 7}"""),
      // vision: hit_counts missing -> patched to size(locations)=2
      ("cuip_vision_events",
        """{"timestamp": 1706745600000, "camera_id": "cam2", "locations": [{"x":1.0,"y":2.0,"label":"car"},{"x":3.0,"y":4.0,"label":"bus"}]}"""),
      // vision: epoch-0 -> dropped
      ("cuip_vision_events", """{"timestamp": 0, "camera_id": "cam1", "locations": []}"""),
      // vision: missing ts -> dropped
      ("cuip_vision_events", """{"camera_id": "cam1", "locations": []}"""),
      // air quality: clean (sensor fields ride in props)
      ("MLK_AIR_QUALITY",
        """{"timestamp": 1704070800000, "nicename": "downtown", "pm25": 12.5, "o3": 0.031}"""),
      // air quality: nan key -> dropped
      ("MLK_AIR_QUALITY", """{"timestamp": 1704070860000, "nicename": "nan", "pm25": 1.0}"""),
      // unknown topic -> dead letter
      ("mystery_topic", """{"whatever": true}"""),
      // malformed JSON on a KNOWN topic -> dead letter too (run.py:40-42
      // kept unreadable messages visible; we must not silently drop them)
      ("cuip_vision_events", """{definitely not json"""))

    val q = IngestPipeline.writer(
      input.toDF().toDF("topic", "value"), root, ckpt, availableNow = true).start()
    q.awaitTermination()

    // vision table: 2 surviving rows, patched hit_counts, partition columns
    val vision = spark.read.parquet(s"$root/vision")
    val vrows = vision.select("entity", "hit_counts", "year", "month")
      .as[(String, Int, Int, Int)].collect().sortBy(_._1)
    assert(vrows === Array(("cam1", 7, 2024, 1), ("cam2", 2, 2024, 2)))
    // partition pruning layout on disk (Hive-style dirs)
    assert(new java.io.File(s"$root/vision/entity=cam1/year=2024/month=1").exists())

    // air quality: 1 surviving row, sensor payload preserved in props
    val aq = spark.read.parquet(s"$root/air_quality")
    val arows = aq.select("entity", "props").as[(String, String)].collect()
    assert(arows.length === 1 && arows(0)._1 === "downtown" && arows(0)._2.contains("pm25"))

    // unknown topic AND malformed-known-topic rows dead-lettered with a
    // reason, not crashed/silently dropped (df_manager.py:115-121,
    // run.py:40-42 intent)
    val dead = spark.read.parquet(s"$root/_dead_letter")
      .select("topic", "reason").as[(String, String)].collect().sorted
    assert(dead === Array(
      ("cuip_vision_events", "malformed_json"),
      ("mystery_topic", "unknown_topic")))
  }

  test("O7 priorityTopics: two independent writers drain hot and rest topics") {
    val root = Files.createTempDirectory("graft_lake3_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt3_").toString
    val src = Files.createTempDirectory("graft_src_").toString
    Files.write(java.nio.file.Paths.get(s"$src/batch.json"), java.util.Arrays.asList(
      """{"topic": "cuip_vision_events", "value": "{\"timestamp\": 1704067200000, \"camera_id\": \"cam1\", \"locations\": [], \"hit_counts\": 1}"}""",
      """{"topic": "MLK_AIR_QUALITY", "value": "{\"timestamp\": 1704070800000, \"nicename\": \"downtown\", \"pm25\": 9.5}"}"""))

    val conf = Map(
      "source" -> s"dir:$src", "root" -> root, "checkpoint" -> ckpt,
      "topics" -> "cuip_vision_events,MLK_AIR_QUALITY",
      "priorityTopics" -> "cuip_vision_events", "mode" -> "drain")
    val queries = graft.streaming.IngestMain.startQueries(spark, conf)
    assert(queries.length === 2, "priorityTopics must start a dedicated hot-topic query")
    queries.foreach(_.awaitTermination())

    assert(spark.read.parquet(s"$root/vision").count() === 1)
    assert(spark.read.parquet(s"$root/air_quality").count() === 1)
  }

  test("O7 edge: blank priorityTopics= falls back to one query (no empty-topic subscription)") {
    val root = Files.createTempDirectory("graft_lake4_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt4_").toString
    val src = Files.createTempDirectory("graft_src4_").toString
    Files.write(java.nio.file.Paths.get(s"$src/batch.json"), java.util.Arrays.asList(
      """{"topic": "cuip_vision_events", "value": "{\"timestamp\": 1704067200000, \"camera_id\": \"cam1\", \"locations\": [], \"hit_counts\": 1}"}"""))

    // "".split(",") yields [""] — must not start a query subscribed to ""
    val conf = Map(
      "source" -> s"dir:$src", "root" -> root, "checkpoint" -> ckpt,
      "topics" -> "cuip_vision_events", "priorityTopics" -> "", "mode" -> "drain")
    val queries = graft.streaming.IngestMain.startQueries(spark, conf)
    assert(queries.length === 1, "blank priorityTopics= must mean no priority split")
    queries.foreach(_.awaitTermination())
    assert(spark.read.parquet(s"$root/vision").count() === 1)
  }

  test("O7 edge: priorityTopics covering every topic — dir twin keeps the dead-letter query") {
    val root = Files.createTempDirectory("graft_lake5_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt5_").toString
    val src = Files.createTempDirectory("graft_src5_").toString
    Files.write(java.nio.file.Paths.get(s"$src/batch.json"), java.util.Arrays.asList(
      """{"topic": "cuip_vision_events", "value": "{\"timestamp\": 1704067200000, \"camera_id\": \"cam1\", \"locations\": [], \"hit_counts\": 1}"}""",
      """{"topic": "mystery_topic", "value": "{\"x\": 1}"}"""))

    val conf = Map(
      "source" -> s"dir:$src", "root" -> root, "checkpoint" -> ckpt,
      "topics" -> "cuip_vision_events,MLK_AIR_QUALITY",
      "priorityTopics" -> "cuip_vision_events,MLK_AIR_QUALITY", "mode" -> "drain")
    val queries = graft.streaming.IngestMain.startQueries(spark, conf)
    // the dir twin's rest query deliberately survives: its exclude filter
    // is what routes UNKNOWN topics to the dead-letter table
    assert(queries.length === 2)
    queries.foreach(_.awaitTermination())
    assert(spark.read.parquet(s"$root/vision").count() === 1)
    val dead = spark.read.parquet(s"$root/_dead_letter")
    assert(dead.filter(col("topic") === "mystery_topic").count() === 1)
  }

  test("O7 edge: kafka source refuses an empty resolved subscription") {
    val e = intercept[IllegalArgumentException] {
      graft.streaming.IngestMain.source(spark,
        Map("source" -> "kafka", "topics" -> " , "))
    }
    assert(e.getMessage.contains("topic"))
  }

  test("dead-letter schema migration: pre-reason files surface a backfilled reason") {
    val root = Files.createTempDirectory("graft_lake6_").toString
    // generation 1 wrote (topic, value) only — simulate those files in place
    Seq(("old_mystery", """{"a": 1}""")).toDF("topic", "value")
      .write.partitionBy("topic").parquet(s"$root/_dead_letter")
    // generation 2 appends with the reason column
    Seq(("new_mystery", """{"b": 2}""", "malformed_json")).toDF("topic", "value", "reason")
      .write.mode("append").partitionBy("topic").parquet(s"$root/_dead_letter")

    val dead = IngestPipeline.readDeadLetter(spark, root)
      .select("topic", "reason").as[(String, String)].collect().sorted
    // both generations present; the pre-reason row backfills to the only
    // reason that existed before the column did
    assert(dead === Array(
      ("new_mystery", "malformed_json"), ("old_mystery", "unknown_topic")))
  }

  test("compact=true after drain: accumulated per-batch files collapse to one per leaf") {
    val root = Files.createTempDirectory("graft_lake7_").toString
    def visionLine(ts: Long) =
      s"""{"topic": "cuip_vision_events", "value": "{\\"timestamp\\": $ts, \\"camera_id\\": \\"cam1\\", \\"locations\\": [], \\"hit_counts\\": 1}"}"""
    // two separate drains (own source dir + checkpoint each) -> two
    // files in the same (cam1, 2024, 1) leaf, the accumulation
    // compaction removes
    Seq(1704067200000L, 1704067260000L).zipWithIndex.foreach { case (ts, i) =>
      val src = Files.createTempDirectory(s"graft_src7_$i").toString
      Files.write(java.nio.file.Paths.get(s"$src/batch.json"),
        java.util.Arrays.asList(visionLine(ts)))
      val conf = Map("source" -> s"dir:$src", "root" -> root,
        "checkpoint" -> Files.createTempDirectory(s"graft_ckpt7_$i").toString,
        "topics" -> "cuip_vision_events", "mode" -> "drain")
      graft.streaming.IngestMain.startQueries(spark, conf).foreach(_.awaitTermination())
    }
    val leaf = new java.io.File(s"$root/vision/entity=cam1/year=2024/month=1")
    def files() = leaf.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files() >= 2, "two drains must have accumulated files")

    graft.streaming.IngestMain.compactLake(spark,
      Map("root" -> root, "mode" -> "drain", "compact" -> "true"))
    assert(files() === 1, "post-drain compaction must leave one file per leaf")
    assert(spark.read.parquet(s"$root/vision").count() === 2)
  }

  test("stats=true maintains the incremental vision rollup across drains") {
    val root = Files.createTempDirectory("graft_lake3_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt3_").toString
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[(String, String)]
    val stream = input.toDF().toDF("topic", "value")

    input.addData(
      ("cuip_vision_events",
        """{"timestamp": 1704067200000, "camera_id": "cam1", "locations": [], "hit_counts": 3}"""),
      ("cuip_vision_events",
        """{"timestamp": 1704067300000, "camera_id": "cam1", "locations": [], "hit_counts": 4}"""),
      ("cuip_vision_events",
        """{"timestamp": 1706745600000, "camera_id": "cam2", "locations": [], "hit_counts": 5}"""))
    IngestPipeline.writer(stream, root, ckpt, availableNow = true, stats = true)
      .start().awaitTermination()
    // second drain folds INTO the rollup instead of recomputing it
    input.addData(("cuip_vision_events",
      """{"timestamp": 1704067400000, "camera_id": "cam1", "locations": [], "hit_counts": 10}"""))
    IngestPipeline.writer(stream, root, ckpt, availableNow = true, stats = true)
      .start().awaitTermination()

    val got = graft.sinks.IncrementalAgg.read(spark, s"$root/_stats/vision")
      .select(col("entity"), col("year"), col("month"), col("n"),
        col("sum_v").cast("double"))
      .as[(String, Int, Int, Long, Double)].collect().sorted.toSeq
    assert(got === Seq(("cam1", 2024, 1, 3L, 17.0), ("cam2", 2024, 2, 1L, 5.0)))
    // and the rollup matches re-aggregating the lake itself
    val full = spark.read.parquet(s"$root/vision")
      .groupBy(col("entity")).agg(count(lit(1)).as("n"), sum("hit_counts").as("s"))
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(full === Seq(("cam1", 3L, 17L), ("cam2", 1L, 5L)))
  }

  test("AvailableNow restart is idempotent (checkpoint prevents reprocessing)") {
    val root = Files.createTempDirectory("graft_lake2_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt2_").toString
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[(String, String)]
    input.addData(("cuip_vision_events",
      """{"timestamp": 1704067200000, "camera_id": "cam1", "locations": [], "hit_counts": 1}"""))

    val stream = input.toDF().toDF("topic", "value")
    IngestPipeline.writer(stream, root, ckpt, availableNow = true).start().awaitTermination()
    // second drain over the same checkpoint: no new data -> no duplicate rows
    IngestPipeline.writer(stream, root, ckpt, availableNow = true).start().awaitTermination()

    assert(spark.read.parquet(s"$root/vision").count() === 1)
  }
}
