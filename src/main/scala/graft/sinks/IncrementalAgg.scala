package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental maintenance of a partitioned aggregate table — the
  * materialized-view pattern for an append-only lake: each micro-batch
  * folds its partial aggregate into ONLY the partitions it touches,
  * instead of recomputing the rollup over the whole history (the
  * reference re-read and re-wrote entire objects per flush,
  * `df_manager.py:81-103`; at 100 TB a full recompute per batch is the
  * difference between seconds and hours).
  *
  * The maintained state is the classic mergeable pair (count, exact
  * decimal sum) per group — re-mergeable in any order, so the fold is
  * associative and replay produces identical bytes. Averages and rates
  * derive at read time.
  *
  * Protocol per batch:
  *   1. partial-aggregate the batch (one shuffle, map-side combined);
  *   2. collect the TOUCHED partition tuples — partition-granular
  *      metadata, bounded by the batch's spread, never row data;
  *   3. read back only those partitions (the filter is a literal
  *      disjunction, so it prunes statically at planning);
  *   4. merge old+new partials and rewrite JUST those partitions via
  *      dynamic partition overwrite.
  * Untouched partitions are never read and never rewritten (the spec
  * asserts their files byte-identical). `localCheckpoint` cuts the
  * merged plan's lineage so the write does not read its own output
  * path.
  */
object IncrementalAgg {

  /** Fold `batch` into the aggregate table at `root`, maintaining
    * per-`keyCols` row counts and the exact decimal sum of `valueCol`,
    * partitioned by `partCols` (a prefix of `keyCols` describing the
    * directory layout). Returns the number of partitions rewritten.
    *
    * `batchId` (streaming callers) makes the fold EXACTLY-ONCE under
    * Structured Streaming's replay model, by the [[QuantileSink]]
    * snapshot protocol: committed ids (`root/_batches/<id>/_APPLIED`)
    * skip; otherwise the touched partitions' pre-batch rows are
    * snapshotted and sealed before the live table is touched, the
    * merge reads the SNAPSHOT (never the live partitions), and the
    * dynamic overwrite is an idempotent rewrite from any crash point.
    * Without `batchId` the fold reads the live table directly (the
    * batch-job path, where re-running means re-adding by intent).
    */
  def maintain(spark: SparkSession, batch: DataFrame, root: String,
               partCols: Seq[String], keyCols: Seq[String],
               valueCol: String, batchId: Option[Long] = None): Int =
    fold(spark,
      batch.withColumn("__dn", lit(1L))
        .withColumn("__dv", col(valueCol).cast(DecimalType(18, 2))),
      root, partCols, keyCols, batchId)

  /** Fold SIGNED deltas into the aggregate — the CDC path: feed it
    * [[graft.operators.Snapshot.toDeltas]] of a snapshot diff and the
    * view moves forward WITHOUT replaying history (added = +1/+value,
    * removed = −1/−value, changed = 0/value-shift). Because the state
    * is a mergeable (count, exact decimal sum), applying the delta is
    * associative with the original folds — maintained ≡ recomputed, the
    * invariant `IncrementalAggSpec` proves. Groups whose count reaches
    * zero are dropped from the rewritten partitions (a fully-retracted
    * key disappears, as a recompute would make it).
    */
  def maintainDeltas(spark: SparkSession, deltas: DataFrame, root: String,
                     partCols: Seq[String], keyCols: Seq[String],
                     dnCol: String, dvCol: String,
                     batchId: Option[Long] = None): Int =
    fold(spark,
      deltas.withColumn("__dn", col(dnCol).cast("long"))
        .withColumn("__dv", col(dvCol).cast(DecimalType(18, 2))),
      root, partCols, keyCols, batchId)

  private def fold(spark: SparkSession, batch: DataFrame, root: String,
                   partCols: Seq[String], keyCols: Seq[String],
                   batchId: Option[Long]): Int = {
    require(partCols.nonEmpty && partCols.forall(keyCols.contains),
      s"partCols $partCols must be a subset of keyCols $keyCols")
    // sum(decimal(18,2)) widens to decimal(28,2); pin the STORED type to
    // decimal(18,2) here so every batch writes the same parquet encoding
    // (mixed widths across partitions break later schema-inferred reads)
    val partial = batch.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__dn")).cast("long").as("n"),
        sum(col("__dv")).cast(DecimalType(18, 2)).as("sum_v"))

    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val applied = batchId.map(id =>
      new org.apache.hadoop.fs.Path(root, s"_batches/$id/_APPLIED"))
    if (applied.exists(fs.exists)) return 0

    val touched: Array[Row] = partial.select(partCols.map(col): _*).distinct().collect()
    if (touched.isEmpty) return 0

    val existing = fs.exists(new org.apache.hadoop.fs.Path(root))
    def liveTouched: DataFrame = {
      // literal disjunction over the touched tuples → static partition pruning
      val pruning = touched.map { r =>
        partCols.zipWithIndex.map { case (c, i) => col(c) === lit(r.get(i)) }
          .reduce(_ && _)
      }.reduce(_ || _)
      spark.read.parquet(root).filter(pruning)
        .select(partial.columns.toIndexedSeq.map(col): _*) // align column order for the union
    }
    // streaming path: merge against a SEALED pre-batch snapshot of the
    // touched partitions, so any crash-point replay recomputes the
    // identical merged rows (the QuantileSink protocol)
    val current: Option[DataFrame] = batchId match {
      case Some(id) =>
        val bdir = new org.apache.hadoop.fs.Path(root, s"_batches/$id")
        val snapDir = new org.apache.hadoop.fs.Path(bdir, "snapshot")
        val snapDone = new org.apache.hadoop.fs.Path(bdir, "_SNAPSHOT_DONE")
        if (!fs.exists(snapDone)) {
          if (fs.exists(snapDir)) fs.delete(snapDir, true) // partial copy
          if (existing) liveTouched.write.mode("overwrite")
            .parquet(snapDir.toString)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], partial.schema)
            .write.mode("overwrite").parquet(snapDir.toString)
          fs.create(snapDone, true).close()
        }
        Some(spark.read.parquet(snapDir.toString))
      case None => if (existing) Some(liveTouched) else None
    }
    val merged = current match {
      case Some(cur) =>
        partial.unionByName(cur)
          .groupBy(keyCols.map(col): _*)
          .agg(sum(col("n")).cast("long").as("n"),
            sum(col("sum_v")).cast(DecimalType(18, 2)).as("sum_v"))
      case None => partial
    }
    // fully-retracted keys (count folded to zero) leave the table, the
    // way a recompute over the corrected source would drop them
    val alive = merged.filter(col("n") =!= 0L)

    // cut lineage AND pin the result BEFORE any directory surgery: the
    // merged plan reads `root`, so both the emptied-partition scan below
    // and the final write must run against materialized rows, not a
    // plan that would re-read paths this fold is about to delete
    val pinned = alive.localCheckpoint(eager = true)

    // dynamic partition overwrite only replaces partitions PRESENT in
    // the written data — a partition whose every key was retracted
    // produces no output rows, so its stale files would silently
    // survive the write. Delete those directories explicitly (touched
    // minus surviving, partition-granular metadata again).
    if (existing) {
      val survived = pinned.select(partCols.map(col): _*).distinct().collect()
        .map(_.toSeq).toSet
      val emptied = touched.filterNot(r => survived.contains(r.toSeq))
      emptied.foreach { r =>
        val rel = partCols.zipWithIndex.map { case (c, i) =>
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .getPartitionPathString(c, String.valueOf(r.get(i)))
        }.mkString("/")
        fs.delete(new org.apache.hadoop.fs.Path(root, rel), true)
      }
    }

    pinned.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(root)
    applied.foreach { marker =>
      fs.create(marker, true).close()
      val bdir = marker.getParent
      fs.delete(new org.apache.hadoop.fs.Path(bdir, "snapshot"), true)
      fs.delete(new org.apache.hadoop.fs.Path(bdir, "_SNAPSHOT_DONE"), true)
    }
    touched.length
  }

  /** Read the maintained aggregate with derived columns (mean). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val t = spark.read.parquet(root)
    t.withColumn("mean_v",
      (col("sum_v").cast("double") / col("n")))
  }
}
