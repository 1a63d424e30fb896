package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.ops.EventOps
import graft.schemas.TopicSchemas
import graft.sinks.PartitionedSink

/** The reference's whole job (SURVEY.md §3 E1/E2) as one Structured
  * Streaming pipeline (model: Armbrust et al., "Structured Streaming: A
  * Declarative API for Real-Time Applications in Apache Spark",
  * SIGMOD 2018): Kafka topics → JSON decode → per-topic transform →
  * entity/year/month-partitioned data lake.
  *
  * What disappears versus the reference: worker processes (O7) →
  * executors; the bounded queue (O6) → `maxOffsetsPerTrigger`
  * backpressure; count-based flushing (O10) → triggers; the local CSV
  * crash mirror (O21) → checkpointing; the months × keys sink loop
  * (O15–O17) → `partitionBy`. CRON drain mode (`README.md:35`, E2) is
  * `Trigger.AvailableNow`: process everything available, checkpoint,
  * exit — with none of the reference's shutdown bugs (`run.py:126-131`).
  *
  * Every transform here is a pure `DataFrame => DataFrame`, so the same
  * code path is exercised by batch tests, `MemoryStream` specs, and the
  * real Kafka source.
  */
object IngestPipeline {

  /** O1 — the Kafka scan. `startingOffsets=earliest` mirrors
    * `auto.offset.reset: beginning` (`run.py:31`); `maxOffsetsPerTrigger`
    * bounds micro-batch size (the reference's flush threshold + queue
    * capacity collapsed into one knob).
    *
    * Deployment note: the `kafka` format lives in the separate
    * `spark-sql-kafka-0-10` artifact, which this offline container
    * neither ships nor can resolve — run with
    * `spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2`
    * (exact recipe in README "Kafka mode"). Everything downstream of
    * `load()` is source-agnostic and is exercised end-to-end by the
    * `dir:` twin and the MemoryStream specs.
    */
  def kafkaSource(spark: SparkSession, bootstrapServers: String, topics: Seq[String],
                  maxOffsetsPerTrigger: Long = 100000L,
                  minPartitions: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
    // O7 (resource split, `run.py:88-105`): `minPartitions` over-splits
    // Kafka partitions so a hot topic gets more than one task per
    // partition — the engine-level half of topic prioritization. The
    // scheduling half is two writers with separate triggers; see
    // [[IngestMain]] `priorityTopics=`.
    minPartitions.foldLeft(reader)((r, n) => r.option("minPartitions", n)).load()
  }

  /** O3/O4/O9/O12/O14/O18 for the vision topic: decode, default
    * `hit_counts` to `size(locations)`, gate validity, derive event time
    * and partition columns. `locations` stays a native array (the
    * reference stringifies it, `run.py:46,51`; `locations_json` keeps
    * CSV-sink parity).
    */
  def transformVision(batch: DataFrame): DataFrame = {
    val decoded = EventOps.decodeJson(batch, TopicSchemas.visionEvent)
      .select(col("record.*"))
    val patched = EventOps.patchHitCounts(decoded)
      .withColumn("locations_json", to_json(col("locations")))
    val timed = EventOps.deriveEventTime(patched, "timestamp", "ts")
    EventOps.withPartitionColumns(
      EventOps.filterValid(timed, "ts", Some("camera_id")), "ts")
      .withColumnRenamed("camera_id", "entity")
  }

  /** Same pipeline for air-quality topics, keyed on `nicename`; the
    * open-ended sensor fields ride along raw in `props`.
    */
  def transformAirQuality(batch: DataFrame): DataFrame = {
    val decoded = EventOps.decodeJson(batch, TopicSchemas.airQualityReading)
      .select(col("record.*"), col("value").cast("string").as("props"))
    val timed = EventOps.deriveEventTime(decoded, "timestamp", "ts")
    EventOps.withPartitionColumns(
      EventOps.filterValid(timed, "ts", Some("nicename")), "ts")
      .withColumnRenamed("nicename", "entity")
  }

  /** Rows on a KNOWN topic whose `value` does not decode against the
    * topic schema: the reference's poll-loop at least kept these visible
    * (`run.py:40-42`); silently vanishing at the validity gate loses
    * data invisibly. Detection uses the standard rescue-column policy —
    * a `columnNameOfCorruptRecord` field distinguishes truly-unparseable
    * JSON (corrupt column set) from valid-but-incomplete records (which
    * the validity gates handle) and from forward-compatible messages
    * with unknown EXTRA fields (which parse cleanly; the typed columns
    * simply ignore the additions).
    */
  private def malformedRows(df: DataFrame,
                            schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val rescued = schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    df.withColumn("record",
        from_json(col("value").cast("string"), rescued,
          Map("columnNameOfCorruptRecord" -> "_corrupt")))
      .filter(col("record").isNull || col("record._corrupt").isNotNull)
      .drop("record")
  }

  /** O8/O22 — topic routing. One cached pass over the micro-batch, one
    * partitioned append per topic family; unknown topics AND undecodable
    * rows on known topics land in the dead-letter table with a `reason`
    * (the reference logs-and-drops unknowns, `df_manager.py:115-121`,
    * and skips unreadable messages visibly, `run.py:40-42`).
    */
  def routeAndWrite(batch: DataFrame, root: String, format: String = "parquet",
                    stats: Boolean = false): Unit = {
    batch.persist()
    try {
      // one output file per (entity, year, month) partition instead of
      // one per task × partition — the small-file guard matters here
      // because a catch-up batch touches every partition at once
      // null-safe routing: a null/missing topic must reach the
      // dead-letter table, not vanish (three-valued logic would make it
      // match no branch)
      val isVision = col("topic") <=> TopicSchemas.visionTopic
      val isAq = coalesce(col("topic").endsWith(TopicSchemas.airQualitySuffix), lit(false))

      val vision = batch.filter(isVision)
      if (!vision.isEmpty) {
        val tv = transformVision(vision)
        PartitionedSink.appendPartitioned(
          PartitionedSink.repartitionByPartitionColumns(tv),
          s"$root/vision", format = format)
        // stats=true additionally maintains the per-entity monthly
        // hit-count rollup incrementally — the derived table a
        // dashboard reads instead of re-aggregating the lake; each
        // batch touches only its own partitions (IncrementalAgg)
        if (stats)
          graft.sinks.IncrementalAgg.maintain(batch.sparkSession, tv,
            s"$root/_stats/vision", Seq("entity"),
            Seq("entity", "year", "month"), "hit_counts")
      }

      val aq = batch.filter(isAq)
      if (!aq.isEmpty)
        PartitionedSink.appendPartitioned(
          PartitionedSink.repartitionByPartitionColumns(transformAirQuality(aq)),
          s"$root/air_quality", format = format)

      def asDead(df: DataFrame, reason: String): DataFrame =
        df.select(coalesce(col("topic"), lit("__null__")).as("topic"),
          col("value").cast("string").as("value"), lit(reason).as("reason"))

      val dead = asDead(batch.filter(!isVision && !isAq), "unknown_topic")
        .unionByName(asDead(
          malformedRows(vision, TopicSchemas.visionEvent), "malformed_json"))
        .unionByName(asDead(
          malformedRows(aq, TopicSchemas.airQualityReading), "malformed_json"))
      if (!dead.isEmpty)
        dead.write.mode("append").partitionBy("topic").format(format)
          .save(s"$root/_dead_letter")
    } finally batch.unpersist()
  }

  /** THE read path for the dead-letter table, across schema generations.
    * Early deployments wrote `(topic, value)` without the `reason` column
    * that later releases append; a plain parquet read over such a mixed
    * directory picks whichever file's footer it samples first and either
    * drops `reason` or drops the old rows nondeterministically. Reading
    * with `mergeSchema` unions the file schemas (old rows surface
    * `reason = NULL`), and the null backfills to `unknown_topic` — the
    * only reason that existed before the column did.
    */
  def readDeadLetter(spark: SparkSession, root: String,
                     format: String = "parquet"): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").format(format)
      .load(s"$root/_dead_letter")
    val withReason =
      if (raw.columns.contains("reason")) raw
      else raw.withColumn("reason", lit(null).cast("string"))
    withReason.withColumn("reason", coalesce(col("reason"), lit("unknown_topic")))
  }

  /** Wire a Kafka-shaped stream (must have `topic` and `value` columns)
    * to the routed sink. `availableNow = true` is CRON-drain mode (E2);
    * false runs as a daemon with the given trigger interval.
    */
  def writer(stream: DataFrame, root: String, checkpoint: String,
             availableNow: Boolean = true, interval: String = "10 seconds",
             format: String = "parquet", stats: Boolean = false): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(interval))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        routeAndWrite(batch, root, format, stats) }
}
