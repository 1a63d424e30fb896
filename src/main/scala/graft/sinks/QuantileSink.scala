package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Standing per-group QUANTILE table maintained incrementally — the
  * [[IncrementalAgg]] materialized-view protocol applied to DDSketch
  * state (Masson et al., VLDB 2019) instead of (count, sum). Each
  * micro-batch folds its per-group bucket-count maps into only the
  * partitions it touches; because bucket maps merge by plain addition
  * (order-independent, associative), the maintained table is
  * BIT-IDENTICAL to a full recompute over the union of all batches —
  * the invariant QuantilesSinkSpec proves — and the sketch's
  * α = (γ−1)/(γ+1) relative-error guarantee survives any number of
  * folds. Use from streaming as
  * `stream.writeStream.foreachBatch((b, _) => maintain(spark, b, …))`
  * — the q76 incremental-rollup shape with quantiles instead of means.
  *
  * State layout: one row per (keyCols…, bucket `k`) with its count —
  * partition-prunable parquet, human-inspectable, mergeable across
  * tables by the same addition. Per group γ = 1.02 spans 9 decades in
  * ~1000 buckets, so state is KB-scale per group at any row count.
  */
object QuantileSink {

  /** Fold `batch` into the sketch table at `root`. Values are bucketed
    * by the SAME [[Sketches.DdSketchAggregator]] the batch operator
    * uses (StrictMath bucketing — a maintained table and a one-shot
    * sketch can never disagree on a boundary). Only positive finite
    * values enter, matching [[Sketches.ddQuantiles]]. Returns the
    * number of partitions rewritten.
    *
    * `batchId` makes the fold EXACTLY-ONCE under Structured
    * Streaming's replay model (restart re-invokes `foreachBatch` with
    * the same id and — for replayable sources — the same rows):
    *
    *   1. `root/_batches/<id>/_APPLIED` present → the fold committed;
    *      skip. This alone is not enough — a crash between the data
    *      write and the marker would otherwise double-fold — so:
    *   2. before touching the live table, the touched partitions'
    *      CURRENT rows are snapshotted to `root/_batches/<id>/snapshot`
    *      (sketch state is KB-scale per group, so this copy is cheap),
    *      sealed by `_SNAPSHOT_DONE`;
    *   3. the merge reads the SNAPSHOT, never the live partitions, so
    *      re-running after ANY crash point recomputes the identical
    *      merged rows and the dynamic-partition overwrite is an
    *      idempotent rewrite;
    *   4. `_APPLIED` commits, the snapshot is dropped.
    *
    * Crash replay matrix: before the snapshot seals → live is
    * untouched, the snapshot rebuilds; after sealing, anywhere through
    * the overwrite → the refold reads the sealed pre-batch state and
    * converges; after `_APPLIED` → skipped. `_`-prefixed paths are
    * invisible to parquet readers. Single-writer (the `foreachBatch`
    * serialization contract) is assumed, as in [[IncrementalAgg]].
    * Without `batchId` the fold reads the live table directly (the
    * batch-job path, where re-running means re-adding by intent).
    */
  def maintain(spark: SparkSession, batch: DataFrame, root: String,
               partCols: Seq[String], keyCols: Seq[String],
               valueCol: String, gamma: Double = 1.02,
               batchId: Option[Long] = None): Int = {
    require(partCols.nonEmpty && partCols.forall(keyCols.contains),
      s"partCols $partCols must be a subset of keyCols $keyCols")
    val agg = udaf(new Sketches.DdSketchAggregator(gamma),
      ExpressionEncoder[Double]())
    val partial = batch
      .select(keyCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull && col("__v") > 0 && !isnan(col("__v")) &&
        col("__v") =!= Double.PositiveInfinity)
      .groupBy(keyCols.map(col): _*)
      .agg(agg(col("__v")).as("__sk"))
      .select(keyCols.map(col) :+ explode(col("__sk")): _*)
      .withColumnRenamed("key", "k").withColumnRenamed("value", "cnt")

    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val applied = batchId.map(id =>
      new org.apache.hadoop.fs.Path(root, s"_batches/$id/_APPLIED"))
    if (applied.exists(fs.exists)) return 0

    val touched: Array[Row] = partial.select(partCols.map(col): _*).distinct().collect()
    if (touched.isEmpty) return 0

    val existing = fs.exists(new org.apache.hadoop.fs.Path(root))
    def liveTouched: DataFrame = {
      val pruning = touched.map { r =>
        partCols.zipWithIndex.map { case (c, i) => col(c) === lit(r.get(i)) }
          .reduce(_ && _)
      }.reduce(_ || _)
      spark.read.parquet(root).filter(pruning)
        .select(partial.columns.toIndexedSeq.map(col): _*)
    }
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
        // bucket counts ADD — the whole mergeability contract
        partial.unionByName(cur)
          .groupBy((keyCols :+ "k").map(col): _*)
          .agg(sum(col("cnt")).cast("long").as("cnt"))
      case None => partial
    }
    // cut lineage before overwriting paths the plan reads
    val pinned = merged.localCheckpoint(eager = true)
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

  /** Quantile estimates from the maintained table: `(keyCols…, q_pct,
    * n, est)` — the exact output shape of [[Sketches.ddQuantiles]], so
    * the maintained view and the one-shot batch operator are
    * interchangeable downstream. `n` is the admitted-value count (the
    * sketch's total mass).
    */
  def quantiles(spark: SparkSession, root: String, keyCols: Seq[String],
                qPcts: Seq[Int], gamma: Double = 1.02): DataFrame = {
    require(qPcts.nonEmpty && qPcts.forall(q => q >= 1 && q <= 100),
      s"percentiles must be in [1, 100], got $qPcts")
    spark.read.parquet(root)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt")).cast("long").as("n"),
        map_from_entries(collect_list(struct(col("k").cast("int"),
          col("cnt").cast("long")))).as("__sk"))
      .select(keyCols.map(col) :+ col("n") :+ col("__sk") :+
        explode(lit(qPcts.map(_.toLong).toArray)).as("q_pct"): _*)
      .withColumn("est", graft.functions.SketchFunctions.ddEstimate(
        col("__sk"), expr("CAST((n * q_pct + 99) DIV 100 AS BIGINT)"), gamma))
      .select(keyCols.map(col) :+ col("q_pct") :+ col("n") :+ col("est"): _*)
  }
}
