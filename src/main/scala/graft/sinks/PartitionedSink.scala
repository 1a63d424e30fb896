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
    * Leaves are independent: a production run fans the per-leaf jobs out
    * concurrently; sequential here keeps failure handling obvious while
    * each leaf's rewrite already parallelizes across the cluster.
    *
    * Crash safety (documented, not transactional): new files land in a
    * `_compact_tmp` subdir first, old files are parked in `_compact_old`
    * before the swap, and `_`-prefixed dirs are invisible to Spark/Hive
    * readers — a crash mid-swap leaves the partition readable or the old
    * files recoverable by hand, never silently half-compacted. True ACID
    * swaps belong to a table format (Delta/Iceberg), whose jars this
    * offline container cannot resolve; this pass is the format-free
    * equivalent for plain parquet lakes.
    *
    * Returns the number of leaf partitions rewritten.
    */
  def compactPartitions(spark: SparkSession, root: String,
                        targetBytes: Long = 128L * 1024 * 1024): Int = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def isHidden(p: Path): Boolean =
      p.getName.startsWith("_") || p.getName.startsWith(".")
    def leaves(p: Path): Seq[Path] = {
      val entries = fs.listStatus(p).filterNot(s => isHidden(s.getPath))
      val here = if (entries.exists(_.isFile)) Seq(p) else Seq.empty
      here ++ entries.filter(_.isDirectory).flatMap(s => leaves(s.getPath))
    }

    var compacted = 0
    leaves(rootPath).foreach { leaf =>
      val files = fs.listStatus(leaf)
        .filter(s => s.isFile && !isHidden(s.getPath))
      val nOut = math.max(1,
        math.ceil(files.map(_.getLen).sum.toDouble / targetBytes).toInt)
      if (files.length > nOut) {
        val tmp = new Path(leaf, "_compact_tmp")
        val old = new Path(leaf, "_compact_old")
        // partition-column values live in the directory name, not the
        // files, so a leaf-local read/rewrite round-trips the data columns
        spark.read.option("mergeSchema", "true").parquet(leaf.toString)
          .coalesce(nOut)
          .write.mode("overwrite").parquet(tmp.toString)
        fs.mkdirs(old)
        files.foreach(f => fs.rename(f.getPath, new Path(old, f.getPath.getName)))
        fs.listStatus(tmp).filter(s => s.isFile && !isHidden(s.getPath))
          .foreach(nf => fs.rename(nf.getPath, new Path(leaf, nf.getPath.getName)))
        fs.delete(tmp, true)
        fs.delete(old, true)
        compacted += 1
      }
    }
    compacted
  }
}
