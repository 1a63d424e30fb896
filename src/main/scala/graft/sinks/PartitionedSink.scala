package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's sink layer (SURVEY.md §2 O16–O21), collapsed into one
  * declarative partitioned write.
  *
  * The reference hand-builds `bucket/{entity}/year={y}/month={m}/...csv`
  * paths in a months × keys driver loop (`df_manager.py:64-112`) and
  * accumulates by read-modify-writing whole CSV objects (O19). Here the
  * same table semantics are a single `partitionBy(entity, year, month)`
  * append — Hive-style directories (which the reference was imitating by
  * hand), no driver-side loop, no read-modify-write, and partition
  * pruning on read for free.
  *
  * Scale: the write shuffles nothing (partitionBy is a per-task fan-out);
  * for low-cardinality entity×month layouts at 100 TB, repartition on the
  * partition columns first to avoid small-file explosion
  * (`repartitionByPartitionColumns`).
  */
object PartitionedSink {

  val defaultPartitionCols: Seq[String] = Seq("entity", "year", "month")

  /** Append a batch to a partitioned table. `format` is "parquet" for the
    * engine's own tables; "csv" is the reference-compat sink (O20) — CSV
    * cannot represent array/struct/map columns, so those are dropped for
    * it (the vision pipeline carries `locations_json` precisely for this
    * sink, mirroring the reference's stringification, `run.py:46,51`).
    */
  def appendPartitioned(df: DataFrame, root: String,
                        partitionCols: Seq[String] = defaultPartitionCols,
                        format: String = "parquet"): Unit = {
    val out = if (format == "csv") dropComplexColumns(df) else df
    out.write.mode("append").partitionBy(partitionCols: _*).format(format).save(root)
  }

  /** Remove columns CSV cannot serialize (arrays, structs, maps). */
  def dropComplexColumns(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val complex = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
                f.dataType.isInstanceOf[StructType] ||
                f.dataType.isInstanceOf[MapType] => f.name
    }
    df.drop(complex.toIndexedSeq: _*)
  }

  /** One output file per (partition-tuple) instead of one per task —
    * the small-file guard for wide-task / low-cardinality-partition
    * writes. A shuffle on the partition columns, then partitionBy.
    */
  def repartitionByPartitionColumns(df: DataFrame,
                                    partitionCols: Seq[String] = defaultPartitionCols): DataFrame =
    df.repartition(partitionCols.map(col): _*)

  /** O19 file-count parity — compaction as an explicit MAINTENANCE pass.
    *
    * The reference keeps exactly one CSV per (entity, year, month) by
    * read-modify-writing the whole object on every flush
    * (`df_manager.py:85-90`) — O(files × batches) rewritten bytes, the
    * part of its design that scales worst. A streaming append sink makes
    * the opposite trade: cheap appends, files accumulating per partition.
    * This pass closes the gap on the reader's terms: each Hive leaf
    * partition with more data files than `ceil(bytes / targetBytes)` is
    * rewritten into that many files (one, for reference-sized partitions).
    * Run it off the hot path (the reference's own CRON cadence), not per
    * batch.
    *
    * Leaves are independent, so the per-leaf rewrites fan out over a
    * fixed-size driver thread pool (`parallelism` concurrent Spark jobs —
    * at 10⁴–10⁵ leaves, serialized job submission would dominate wall
    * clock; each leaf's rewrite additionally parallelizes across the
    * cluster). A failed leaf fails the pass after in-flight leaves
    * finish; completed leaves stay compacted (the pass is idempotent —
    * rerun it).
    *
    * `format` must match what [[appendPartitioned]] wrote: parquet reads
    * merge schemas across files (the dead-letter migration path); csv
    * reads are header-less all-string (no type inference — values
    * round-trip verbatim into the rewritten files).
    *
    * Crash safety (documented, not transactional): new files land in a
    * `_compact_tmp` subdir first, old files are parked in `_compact_old`
    * before the swap, and `_`-prefixed dirs are invisible to Spark/Hive
    * readers — a crash mid-swap leaves the partition readable or the old
    * files parked, never silently half-compacted. The next compaction
    * pass SELF-HEALS a crashed leaf before touching it: a `_compact_old`
    * with no visible data files means the crash hit between park and
    * swap-in, so the parked files are restored; a `_compact_old` next to
    * visible files means the swap-in completed, so the stale parked
    * copies are dropped; a leftover `_compact_tmp` is always discarded
    * (its contents are re-derivable). True ACID swaps belong to a table
    * format (Delta/Iceberg), whose jars this offline container cannot
    * resolve; this pass is the format-free equivalent for plain lakes.
    *
    * Returns the number of leaf partitions rewritten.
    */
  def compactPartitions(spark: SparkSession, root: String,
                        targetBytes: Long = 128L * 1024 * 1024,
                        format: String = "parquet",
                        parallelism: Int = 8): Int = {
    require(Set("parquet", "csv")(format),
      s"compactPartitions supports parquet and csv lakes, got: $format")
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def isHidden(p: Path): Boolean =
      p.getName.startsWith("_") || p.getName.startsWith(".")
    def leaves(p: Path): Seq[Path] = {
      val entries = fs.listStatus(p).filterNot(s => isHidden(s.getPath))
      val here = if (entries.exists(_.isFile)) Seq(p) else Seq.empty
      here ++ entries.filter(_.isDirectory).flatMap(s => leaves(s.getPath))
    }

    def visibleFiles(leaf: Path) =
      fs.listStatus(leaf).filter(s => s.isFile && !isHidden(s.getPath))

    // self-heal a leaf a previous pass crashed in (see scaladoc)
    def recoverLeaf(leaf: Path): Unit = {
      val old = new Path(leaf, "_compact_old")
      val tmp = new Path(leaf, "_compact_tmp")
      if (fs.exists(old)) {
        if (visibleFiles(leaf).isEmpty)
          fs.listStatus(old).filter(_.isFile)
            .foreach(f => fs.rename(f.getPath, new Path(leaf, f.getPath.getName)))
        fs.delete(old, true)
      }
      if (fs.exists(tmp)) fs.delete(tmp, true)
    }

    def compactLeaf(leaf: Path): Boolean = {
      recoverLeaf(leaf)
      val files = visibleFiles(leaf)
      val nOut = math.max(1,
        math.ceil(files.map(_.getLen).sum.toDouble / targetBytes).toInt)
      if (files.length <= nOut) false
      else {
        val tmp = new Path(leaf, "_compact_tmp")
        val old = new Path(leaf, "_compact_old")
        // partition-column values live in the directory name, not the
        // files, so a leaf-local read/rewrite round-trips the data columns
        val data = format match {
          case "parquet" =>
            spark.read.option("mergeSchema", "true").parquet(leaf.toString)
          case "csv" =>
            spark.read.format("csv").load(leaf.toString)
        }
        data.coalesce(nOut).write.mode("overwrite").format(format).save(tmp.toString)
        fs.mkdirs(old)
        files.foreach(f => fs.rename(f.getPath, new Path(old, f.getPath.getName)))
        fs.listStatus(tmp).filter(s => s.isFile && !isHidden(s.getPath))
          .foreach(nf => fs.rename(nf.getPath, new Path(leaf, nf.getPath.getName)))
        fs.delete(tmp, true)
        fs.delete(old, true)
        true
      }
    }

    val allLeaves = leaves(rootPath)
    if (allLeaves.isEmpty) 0
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, allLeaves.size))
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        val rewrites = allLeaves.map(leaf => Future(compactLeaf(leaf)))
        Await.result(Future.sequence(rewrites), scala.concurrent.duration.Duration.Inf)
          .count(identity)
      } finally pool.shutdown()
    }
  }
}
