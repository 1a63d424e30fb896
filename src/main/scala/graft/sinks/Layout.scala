package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout control for scan-time skipping: Z-order clustering plus
  * file-level min/max pruning over plain parquet — the mechanism behind
  * every modern lake format's data skipping, built here from public
  * Spark primitives only.
  *
  * Why layout is a 100 TB concern: partition pruning (the Hive-style
  * `entity/year/month` dirs of [[PartitionedSink]]) only skips on the
  * partition columns. A selective predicate on anything else still scans
  * every file — unless files are CLUSTERED so each holds a narrow range
  * of the filter column, making per-file min/max stats selective.
  * Linear sort clusters one column perfectly and the rest not at all;
  * a Z-order (Morton) curve interleaves the key bits so EVERY clustered
  * column maps to a bounded min/max band per file — skipping works on
  * each of them (Morton 1966; the layout Delta's `OPTIMIZE ZORDER BY`
  * popularized).
  *
  * The stats "manifest" is computed from the data (one aggregate over
  * `input_file_name`), kept as a DataFrame, and joined driver-side only
  * at file granularity — metadata scale (n files), never row scale.
  */
object Layout {

  /** Morton z-address of `cols`: the low `bits` of each column
    * interleaved round-robin (column 0 owns the least-significant
    * position of each group). Codegen'd shift/mask/or primitives only —
    * no UDF, no HOF. Columns must already be non-negative integers
    * (bucketize first if not); values ≥ 2^bits fold into the top bucket
    * and negatives clamp to 0 (sign extension would otherwise bleed
    * 1-bits across every interleave position), keeping the address
    * total over all Long inputs.
    */
  def zAddress(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zAddress needs at least one column")
    require(bits * cols.size <= 62, s"${cols.size} cols × $bits bits overflows a Long")
    val masked = cols.map(c => when(c < 0, lit(0L))
      .when(c >= (1L << bits), lit((1L << bits) - 1))
      .otherwise(c.cast("long")))
    val terms = for {
      (c, ci) <- masked.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * cols.size + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` as `nFiles` parquet files clustered on the Z-order of
    * `zCols`: range-repartition on the z-address (contiguous curve
    * segments per file), sort within each partition so parquet
    * row-group stats are tight too, drop the helper column, write.
    * One shuffle — the same cost as any repartition-before-write — buys
    * min/max skipping on every clustered column forever after.
    */
  def writeZOrdered(df: DataFrame, zCols: Seq[Column], outDir: String,
                    nFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zAddress(zCols, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)

  /** Opt-in CONTENT-SIMILARITY write ordering: write `df` as `nFiles`
    * parquet files ordered by the normalized prefix of `textCol` (the
    * q206 sorted-neighborhood key — lowercased, whitespace-collapsed,
    * first `keyLen` chars). Parquet compresses page-locally, so at
    * corpus scale (written once, scanned thousands of times) placing
    * near-identical documents in the same row groups is a first-class
    * storage lever: 33 % fewer bytes at web-crawl-like 40 % near-dup
    * mass (BASELINE `layout_compress`), negligible on mostly-unique
    * corpora — opt in where the dup mass is.
    *
    * Scale shape: ONE range exchange on the bounded `keyLen`-byte key
    * (the same shuffle any global sort pays — never the full text),
    * then a partition-local sort on (key, full text) so equal-prefix
    * documents are page-adjacent too; the helper key is dropped before
    * the write. Composes with (does not replace) dedup, and the
    * [[writeZOrdered]]/[[bucketedTable]] tiers still own the
    * query-pruning side of layout — this one buys bytes-on-disk.
    */
  def similarityOrdered(df: DataFrame, textCol: String, outDir: String,
                        nFiles: Int, keyLen: Int = 64,
                        tieCols: Seq[Column] = Nil): Unit = {
    require(nFiles >= 1, s"file count must be >= 1, got $nFiles")
    require(keyLen >= 1, s"keyLen must be >= 1, got $keyLen")
    // tieCols (e.g. the unique id) totalize the within-partition sort:
    // without them, rows sharing (key, text) order arbitrarily and a
    // replayed write is set-equal but not byte-identical — the
    // CurationLoop lake replays under exactly-once markers, so its
    // bytes must be deterministic
    df.withColumn("__simkey", substring(
        graft.functions.TextFunctions.normalize(col(textCol)), 1, keyLen))
      .repartitionByRange(nFiles, col("__simkey"))
      .sortWithinPartitions(col("__simkey") +: col(textCol) +: tieCols: _*)
      .drop("__simkey")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Per-file [min, max] of `statCols`: one aggregate grouped on
    * `input_file_name` — n_files rows out, computed distributed. In a
    * real lake this materializes once per compaction pass and is cached
    * as the skipping manifest (Delta/Iceberg keep exactly these stats
    * in their logs); recomputing per query would re-scan the data and
    * defeat the point.
    */
  def fileStats(spark: SparkSession, dir: String, statCols: Seq[String]): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statCols.head)).as(s"${statCols.head}_min"),
        (max(col(statCols.head)).as(s"${statCols.head}_max") +:
          statCols.tail.flatMap(c =>
            Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))): _*)

  /** Exact integer division for non-negative longs (double division of
    * a remainder-free numerator is exact below 2^53).
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Scale a non-negative column with known `maxVal` onto the
    * `bits`-wide bucket domain. Z-order only clusters every dim when the
    * dims have comparable bit widths: raw interleave of a 4-bit dim with
    * a 17-bit dim puts ALL the wide dim's high bits above the narrow
    * dim's — file boundaries then split purely on the wide dim and the
    * narrow dim's per-file [min, max] spans its whole range (zero
    * skipping). Normalizing each dim to the same width first is the
    * standard fix (Delta's OPTIMIZE ZORDER range-partitions each column
    * for the same reason).
    */
  def scaleToBits(c: Column, maxVal: Long, bits: Int): Column = {
    require(maxVal >= 0 && bits > 0 && bits <= 31, s"bad maxVal=$maxVal bits=$bits")
    val clamped = greatest(c.cast("long"), lit(0L))
    // exact integer path only while c * 2^bits cannot wrap a Long; for
    // huge domains (e.g. nanosecond epochs) divide first in Double —
    // approximate is fine for CLUSTERING (stats stay true min/max; the
    // exact predicate re-applies at read), wrapped garbage is not
    val scaled =
      if (maxVal < (1L << (62 - bits)))
        idiv(clamped * (1L << bits), lit(maxVal + 1L))
      else
        floor(clamped.cast("double") * (1L << bits).toDouble / (maxVal.toDouble + 1))
          .cast("long")
    least(lit((1L << bits) - 1), scaled)
  }

  /** JVM-lifetime cache of (copy dir, persisted stats manifest) per key —
    * the lake-layout lifecycle in miniature: cluster once per compaction
    * pass, serve every subsequent query from the manifest. The manifest
    * is materialized exactly once; re-deriving it per query would
    * re-scan the copy and defeat the skipping.
    */
  private val copies =
    new java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame)]()

  /** Z-order `df` on `zCols` (domain-normalized via [[scaleToBits]] —
    * per-column maxes come from one metadata-scale aggregate, the same
    * scan the layout write itself pays) into a cached temp copy, and
    * return (copy dir, per-file min/max manifest for `zCols`).
    *
    * SINGLE-WRITER contract, like any compaction job: the copy lives at
    * a deterministic per-key path (md5 of the full key — collision-proof
    * dir identity, and repeated JVM runs reuse one path instead of
    * accumulating temp copies), so two processes laying out the same key
    * concurrently would race on it, exactly as two compactors racing on
    * one table partition would. Run layout passes one at a time per key.
    */
  def zOrderedWithStats(df: DataFrame, cacheKey: String, zCols: Seq[String],
                        nFiles: Int, bits: Int = 16): (String, DataFrame) =
    // the layout parameters are part of the identity: the same string
    // key with different zCols/nFiles/bits must not serve a stale copy
    // the resolved scratch root rides in the memo key: relocating
    // spark.graft.scratchDir must rebuild, not serve the old root
    copies.computeIfAbsent(
      s"${graft.GraftSession.scratchRoot(df.sparkSession)}|" +
        s"$cacheKey|${zCols.mkString(",")}|$nFiles|$bits", fullKey => {
      val keyHex = java.security.MessageDigest.getInstance("MD5")
        .digest(fullKey.getBytes("UTF-8")).map("%02x".format(_)).mkString
      // the overwrite-mode write wipes any stale copy from a prior run
      val dir = graft.GraftSession.scratchPath(df.sparkSession,
        s"graft-zorder-$keyHex/lake")
      val maxRow = df.agg(
        max(col(zCols.head)).cast("long").as("m0"),
        zCols.tail.zipWithIndex.map { case (c, i) =>
          max(col(c)).cast("long").as(s"m${i + 1}") }: _*).head()
      // empty input (or an all-null column) has no max: every value
      // clamps to bucket 0, and the write still produces a valid layout
      val maxes = zCols.indices.map(i =>
        if (maxRow.isNullAt(i)) 0L else math.max(0L, maxRow.getLong(i)))
      val scaled = zCols.indices.map(i => scaleToBits(col(zCols(i)), maxes(i), bits))
      writeZOrdered(df, scaled, dir, nFiles, bits)
      val st = fileStats(df.sparkSession, dir, zCols).persist()
      st.count()
      (dir, st)
    })

  /** Read only the files whose [min, max] band intersects `[lo, hi]` on
    * `column`, then apply the exact predicate. The stats join is
    * file-granular: `stats` has one row per file, so the collect is
    * metadata, not data. Returns (pruned DataFrame, files read,
    * files total) so callers — and specs — can see the skip rate.
    */
  def readPruned(spark: SparkSession, dir: String, stats: DataFrame,
                 column: String, lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val files = stats.select(col("file"), col(s"${column}_min"), col(s"${column}_max"))
      .collect()
    val keep = files.filter(r => r.getLong(1) <= hi && r.getLong(2) >= lo).map(_.getString(0))
    val df =
      if (keep.isEmpty) spark.read.parquet(dir).filter(lit(false))
      else spark.read.parquet(keep.toIndexedSeq: _*)
        .filter(col(column) >= lo && col(column) <= hi)
    (df, keep.length, files.length)
  }

  /** Save `df` ONCE as a bucketed, per-bucket-sorted parquet table in
    * the session catalog and return the table name — the layout that
    * removes the JOIN exchange entirely: two tables bucketed on their
    * join keys into the SAME bucket count sort-merge join with ZERO
    * ShuffleExchange (each bucketed scan reports its hash
    * partitioning, so EnsureRequirements inserts nothing), the
    * co-location big lakes buy once at write time instead of paying a
    * fact-table shuffle on every query. The input repartitions to one
    * partition per bucket before the write, so every bucket is ONE
    * sorted file and the scan also reports its sort order — the merge
    * side needs no Sort either.
    *
    * The table is EXTERNAL with data at a deterministic temp path;
    * same single-writer contract as [[zOrderedWithStats]]. Existence
    * is checked against the CATALOG (not a JVM map), so a new session
    * in the same JVM rebuilds instead of serving a dangling name.
    */
  def bucketedTable(df: DataFrame, cacheKey: String, bucketCol: String,
                    nBuckets: Int): String = {
    require(nBuckets >= 1, s"bucket count must be >= 1, got $nBuckets")
    // scratch root in the identity: a relocated root names a different
    // catalog table, so the existence check cannot serve the old path
    val fullKey = s"${graft.GraftSession.scratchRoot(df.sparkSession)}|" +
      s"$cacheKey|$bucketCol|$nBuckets"
    val keyHex = java.security.MessageDigest.getInstance("MD5")
      .digest(fullKey.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val name = s"graft_bucketed_$keyHex"
    this.synchronized {
      if (!df.sparkSession.catalog.tableExists(name)) {
        val dir = graft.GraftSession.scratchPath(df.sparkSession,
          s"graft-bucketed-$keyHex/lake")
        df.repartition(nBuckets, col(bucketCol))
          .write.mode("overwrite").format("parquet")
          .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
          .option("path", dir).saveAsTable(name)
      }
    }
    name
  }

  // Hive-partitioned copies, same once-per-key lifecycle as [[copies]]
  private val partCopies =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Write `df` once as a Hive-partitioned parquet layout
    * (`dir/<partCol>=<v>/...`) at a deterministic per-key path and
    * return the directory — the layout that makes PARTITION pruning
    * (static and dynamic) available to every later read. Same
    * single-writer contract as [[zOrderedWithStats]].
    */
  def partitionedCopy(df: DataFrame, cacheKey: String, partCol: String): String =
    partCopies.computeIfAbsent(
      s"${graft.GraftSession.scratchRoot(df.sparkSession)}|" +
        s"$cacheKey|$partCol", fullKey => {
      val keyHex = java.security.MessageDigest.getInstance("MD5")
        .digest(fullKey.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val dir = graft.GraftSession.scratchPath(df.sparkSession,
        s"graft-hivepart-$keyHex/lake")
      df.write.mode("overwrite").partitionBy(partCol).parquet(dir)
      dir
    })
}
