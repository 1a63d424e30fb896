package graft.sinks

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.hadoop.fs.Path

import graft.functions.TextFunctions
import graft.operators.Corpus

/** Deterministic training-shard export — the terminal stage of a
  * curation pipeline: the corpus lands as `shard=K/` parquet
  * directories of ~`budget` tokens each, GLOBALLY SHUFFLED by a
  * content-addressed draw so every shard is an unbiased sample of the
  * whole corpus (what sequential training consumption requires — a
  * loader can stream shard 0, 1, 2… and see an i.i.d.-ish mix instead
  * of one source at a time; cf. the shard-shuffled training corpora of
  * T5, Raffel et al. 2020 §2.2, and the GPT-NeoX/Megatron data
  * pipelines), plus a one-row-per-shard MANIFEST (doc count, token
  * count, rank span, order-independent content fingerprint) written
  * LAST as the commit record.
  *
  * Determinism: the order is [[graft.operators.Corpus.shuffleOrder]]'s
  * content-addressed draw (`md5(salt:id)`), so the same corpus + salt
  * always produces byte-identical shard membership — replays and
  * reruns converge with no RNG state to carry.
  *
  * Shard assignment is first-fit sequential over the shuffled order:
  * a document's shard is `floor(prefixTokens / budget)` where
  * `prefixTokens` counts the tokens STRICTLY BEFORE it — shards are
  * contiguous rank spans, every shard except the last holds at least
  * `budget` tokens' worth of boundary, and no document splits.
  *
  * Scale shape (the 100 TB read): the corpus is exchanged exactly
  * twice — the rank range-exchange (the physical shuffle this export
  * exists to produce) and one bucket-aligned exchange for the prefix
  * sum — and the prefix sum itself is the two-level decomposition of
  * [[graft.operators.Corpus.packSequences]] (per-bucket partial sums →
  * a TINY partition-less window over `corpus/bucketWidth` bucket rows
  * (metadata scale — raise `bucketWidth` with the corpus) → per-bucket
  * local cumsum), never a corpus-wide single-partition sort. The
  * `partitionBy(shard)` write shuffles nothing: shards are contiguous
  * in the rank order the rows already hold, so each write task touches
  * few shard directories. The manifest aggregation partial-aggregates
  * map-side to `n_shards` rows.
  *
  * Crash protocol: data first, manifest last — the manifest IS the
  * commit marker. A crash mid-write leaves data files but no manifest;
  * [[manifest]]/[[manifestFromData]] refuse to read (fail fast naming
  * the missing commit), and the next [[write]] call overwrites the
  * partial data cleanly. A completed export short-circuits: [[write]]
  * on a committed `outDir` returns the stored manifest without
  * touching data (idempotent replay).
  */
object ShardExport {

  private val d38 = DecimalType(38, 0)

  def dataDir(outDir: String): String = s"$outDir/data"
  def manifestDir(outDir: String): String = s"$outDir/manifest"

  /** One document's 60-bit content term, summed per shard (exactly, in
    * DECIMAL(38,0)) and reduced mod 2^61 into the order-independent
    * BIGINT `content_fp`: any lost, duplicated, or mutated document
    * anywhere in the write/read path changes the sum (mod-2^61 collision
    * odds ~2^-61 per shard). Null text folds to '' so the term is total.
    * The output is a plain long — the manifest carries no decimal
    * column, so it round-trips byte-identically through any parquet
    * reader's type canonicalization.
    */
  private def fpTerm(idCol: String, textCol: String) =
    conv(substring(md5(concat_ws(":", lit("fp"), col(idCol).cast("string"),
      coalesce(col(textCol), lit("")))), 1, 15), 16, 10).cast(d38)

  /** 2^61 — the content_fp modulus (fits BIGINT with headroom). */
  val fpModulus: Long = 2305843009213693952L

  private def hasShardDirs(fs: org.apache.hadoop.fs.FileSystem,
                           outDir: String): Boolean = {
    val d = new Path(dataDir(outDir))
    fs.exists(d) && fs.listStatus(d).exists(_.getPath.getName.startsWith("shard="))
  }

  private def manifestAgg(df: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    df.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(TextFunctions.tokenCount(col(textCol)), lit(0L)))
          .as("n_tokens"),
        min(col("shuffle_rank")).as("rank_min"),
        max(col("shuffle_rank")).as("rank_max"),
        pmod(sum(fpTerm(idCol, textCol)), lit(fpModulus).cast(d38))
          .cast("long").as("content_fp"))

  /** The assignment stage of [[write]], exposed: `docs` + `shuffle_rank`
    * + `shard`, un-materialized — what a caller composes with when the
    * physical write happens elsewhere (a different sink, a dry-run shard
    * size report). Global shuffle order first (the corpus's one range
    * exchange, [[graft.operators.Corpus.shuffleOrder]]), then the
    * first-fit prefix sum carried INLINE so the payload columns never
    * take an extra join: per-bucket partial sums, a partition-less
    * cumsum over the `corpus/bucketWidth` bucket rows ONLY (metadata
    * scale by the packSequences convention — raise `bucketWidth` with
    * the corpus), broadcast back, per-bucket local cumsum.
    */
  def assignShards(docs: DataFrame, idCol: String, textCol: String,
                   budget: Long, salt: String,
                   bucketWidth: Long = 4096): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val reserved = Seq("shard", "shuffle_rank").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"input columns ${reserved.mkString(", ")} collide with the export's " +
        "output columns — rename them before sharding")
    val ordered = Corpus.shuffleOrder(docs, idCol, salt)
    val t = ordered
      .withColumn("__n",
        coalesce(TextFunctions.tokenCount(col(textCol)), lit(0L)))
      .withColumn("__bucket",
        floor(col("shuffle_rank") / bucketWidth).cast("long"))
    val bucketSums = t.groupBy(col("__bucket"))
      .agg(sum(col("__n")).as("__bsum"))
    val wBuckets = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOffsets = bucketSums
      .withColumn("__boff", coalesce(sum(col("__bsum")).over(wBuckets), lit(0L)))
      .drop("__bsum")
    val wInBucket = Window.partitionBy(col("__bucket"))
      .orderBy(col("shuffle_rank"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t.join(broadcast(bucketOffsets), "__bucket")
      .withColumn("__off",
        col("__boff") + coalesce(sum(col("__n")).over(wInBucket), lit(0L)))
      .withColumn("shard", floor(col("__off") / budget).cast("long"))
      .drop("__bucket", "__boff", "__off", "__n")
  }

  /** Export `docs` as token-budget shards under `outDir` and return the
    * stored manifest. `docs` must carry `idCol` (unique) and `textCol`;
    * every other column rides along into the shard files.
    */
  def write(spark: SparkSession, docs: DataFrame, idCol: String,
            textCol: String, budget: Long, salt: String, outDir: String,
            bucketWidth: Long = 4096): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val fs = new Path(outDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(manifestDir(outDir)))) return manifest(spark, outDir)

    val withShard = assignShards(docs, idCol, textCol, budget, salt, bucketWidth)
    withShard.write.mode("overwrite").partitionBy("shard")
      .parquet(dataDir(outDir))
    // manifest from the READ-BACK files, written last as the commit:
    // the stored manifest describes what is durably on disk, not what
    // the writer intended (an empty corpus writes no shard directories
    // and commits an empty manifest with the same schema)
    val m = manifestAgg(
      if (hasShardDirs(fs, outDir)) spark.read.parquet(dataDir(outDir))
      else withShard.limit(0), idCol, textCol)
    m.coalesce(1).write.mode("overwrite").parquet(manifestDir(outDir))
    manifest(spark, outDir)
  }

  /** The stored (committed) manifest. Fails fast on an uncommitted
    * export — data files without a manifest are a crashed write.
    */
  def manifest(spark: SparkSession, outDir: String): DataFrame = {
    val p = new Path(manifestDir(outDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no committed manifest under $outDir — crashed or never-run export; re-run write()")
    spark.read.parquet(manifestDir(outDir))
  }

  /** The manifest RECOMPUTED from the shard files on disk — the
    * round-trip audit: equal to [[manifest]] iff no document was lost,
    * duplicated, or mutated between the writer's frame and the durable
    * files. Empty exports (a committed manifest with zero rows writes
    * no shard directories) recompute to the stored empty frame.
    */
  def manifestFromData(spark: SparkSession, outDir: String, idCol: String,
                       textCol: String): DataFrame = {
    val stored = manifest(spark, outDir)
    val fs = new Path(outDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (!hasShardDirs(fs, outDir)) stored.limit(0)
    else manifestAgg(spark.read.parquet(dataDir(outDir)), idCol, textCol)
  }

  /** Read the exported corpus back (all shards, payload + `shard` +
    * `shuffle_rank`). Committed exports only.
    */
  def readBack(spark: SparkSession, outDir: String): DataFrame = {
    manifest(spark, outDir) // commit check
    val fs = new Path(outDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    require(hasShardDirs(fs, outDir),
      s"committed export under $outDir is empty — no shard files to read " +
        "(parquet cannot type an empty directory; check the manifest instead)")
    spark.read.parquet(dataDir(outDir))
  }
}
