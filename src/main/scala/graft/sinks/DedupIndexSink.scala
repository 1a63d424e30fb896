package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Self-maintaining near-dup INDEX — the continuous-ingest dedup loop:
  * every arriving batch is (1) probed against the standing MinHash
  * index ([[Dedup.incrementalNearDupPrepared]] — the index side never
  * shuffles, batch state broadcasts), (2) checked against ITSELF for
  * intra-batch pairs ([[Dedup.minhashLshPairs]] at batch scale), and
  * (3) APPENDED to the index as per-document prepared state
  * ([[Dedup.prepareNearDupIndex]] rows: sorted shingle hashes + MinHash
  * signature — text is never stored and never re-read). Day N's cost is
  * O(batch · index-probe), not O(corpus²): the q105 incremental
  * discipline with the index maintenance closed into the same
  * exactly-once loop.
  *
  * Exactly-once under Structured Streaming replay (the [[QuantileSink]]
  * protocol, SIMPLER here because the index is append-only — no
  * existing partition is ever rewritten, so no snapshot is needed):
  * batch `id`'s state lands at `root/ingest_batch=<id>/` and its probe
  * result at `root/_matches/ingest_batch=<id>/`, both via overwrite
  * (idempotent per id); `root/_batches/<id>/_APPLIED` commits. A replay
  * re-probes against exactly the same prior state (the probe reads
  * only sealed `ingest_batch < id` directories, never its own), so any
  * crash point converges to identical bytes. Single-writer (the
  * `foreachBatch` serialization contract) is assumed.
  *
  * Use from streaming as
  * `stream.writeStream.foreachBatch((b, id) => maintain(spark, b, root,
  * "doc_id", "text", id))`.
  */
object DedupIndexSink {

  import org.apache.hadoop.fs.Path

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All path arithmetic goes through hadoop [[Path]] — NEVER
    * `java.io.File` — so a scheme-qualified root (`s3a://bucket/x`,
    * `hdfs://nn/x`) survives joining: `File` would collapse the
    * `scheme://` double slash into `scheme:/` and the sink would
    * write to a local path that does not exist. See the sibling
    * [[QuantileSink]] which established the pattern.
    */
  private[graft] def join(root: String, segments: String*): Path =
    segments.foldLeft(new Path(root))((p, s) => new Path(p, s))

  private def batchDirs(spark: SparkSession, dir: String): Seq[(Long, String)] = {
    val p = new Path(dir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("ingest_batch="))
      .map(q => (q.getName.stripPrefix("ingest_batch=").toLong, q.toString))
      .sortBy(_._1)
  }

  /** Batch ids under `root` whose `_batches/<id>/_APPLIED` marker
    * exists — i.e. batches that committed. A crashed batch may leave
    * `ingest_batch=<id>/` or `_matches/ingest_batch=<id>/` data with
    * no marker; readers must not surface it (the stream will replay
    * that id and overwrite both directories idempotently).
    */
  private def committedIds(spark: SparkSession, root: String): Set[Long] = {
    val base = join(root, "_batches")
    val fs = fsOf(spark, root)
    if (!fs.exists(base)) Set.empty
    else fs.listStatus(base).toSeq.map(_.getPath)
      .filter(d => fs.exists(new Path(d, "_APPLIED")))
      .flatMap(d => scala.util.Try(d.getName.toLong).toOption)
      .toSet
  }

  /** Probe `batch` against the standing index and fold its prepared
    * state in — exactly once per `batchId` (see object doc). Returns
    * the batch's match set `(new_id, old_id, inter, un, jac)`:
    * cross pairs (new in this batch, old already indexed) plus
    * intra-batch pairs (`new_id` is the larger id). Re-invoking with a
    * committed id skips all work and re-reads the stored result.
    */
  def maintain(spark: SparkSession, batch: DataFrame, root: String,
               idCol: String, textCol: String, batchId: Long,
               numHashes: Int = 128, bands: Int = 32,
               thresholdNum: Int = 7, thresholdDen: Int = 10,
               ngram: Int = 3, seed: Long = 42L): DataFrame = {
    val fs = fsOf(spark, root)
    val applied = join(root, "_batches", batchId.toString, "_APPLIED")
    val matchesDir = join(root, "_matches", s"ingest_batch=$batchId").toString
    if (!fs.exists(applied)) {
      val idT = batch.schema(idCol).dataType
      val matchSchema = StructType(Seq(StructField("new_id", idT),
        StructField("old_id", idT), StructField("inter", LongType),
        StructField("un", LongType), StructField("jac", DoubleType)))
      // the probe reads ONLY sealed prior batches, by explicit path —
      // partition discovery must not touch this id's own (possibly
      // half-written, pre-crash) directory
      val prior = batchDirs(spark, root).filter(_._1 < batchId).map(_._2)
      val cross =
        if (prior.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], matchSchema)
        else Dedup.incrementalNearDupPrepared(batch,
          spark.read.option("basePath", root).parquet(prior: _*)
            .drop("ingest_batch"),
          idCol, textCol, numHashes, bands, thresholdNum, thresholdDen,
          ngram, seed)
      val intra = Dedup.minhashLshPairs(batch, idCol, textCol, numHashes,
          bands, thresholdNum, thresholdDen, ngram, seed)
        .select(col("b_id").as("new_id"), col("a_id").as("old_id"),
          col("inter").cast("long").as("inter"),
          col("un").cast("long").as("un"), col("jac"))
      cross.select(col("new_id"), col("old_id"),
          col("inter").cast("long").as("inter"),
          col("un").cast("long").as("un"), col("jac"))
        .unionByName(intra)
        .write.mode("overwrite").parquet(matchesDir)
      Dedup.prepareNearDupIndex(batch, idCol, textCol, ngram, numHashes, seed)
        .write.mode("overwrite")
        .parquet(join(root, s"ingest_batch=$batchId").toString)
      fs.create(applied, true).close()
    }
    spark.read.parquet(matchesDir)
  }

  /** Every committed batch's matches, with the `ingest_batch` id.
    * Listed directories are filtered by the `_APPLIED` marker, so a
    * crashed batch's half-written matches never surface here — only
    * after its replay re-commits them.
    */
  def allMatches(spark: SparkSession, root: String): DataFrame = {
    val base = join(root, "_matches").toString
    val ok = committedIds(spark, root)
    val dirs = batchDirs(spark, base).filter(d => ok(d._1))
    require(dirs.nonEmpty, s"no committed batches under $root")
    spark.read.option("basePath", base).parquet(dirs.map(_._2): _*)
  }

  /** The standing per-document index state across all committed
    * batches: `(ingest_batch, idCol, shingles, sig)`. Filtered by the
    * `_APPLIED` marker like [[allMatches]].
    */
  def state(spark: SparkSession, root: String): DataFrame = {
    val ok = committedIds(spark, root)
    val dirs = batchDirs(spark, root).filter(d => ok(d._1))
    require(dirs.nonEmpty, s"no committed batches under $root")
    spark.read.option("basePath", root).parquet(dirs.map(_._2): _*)
  }
}
