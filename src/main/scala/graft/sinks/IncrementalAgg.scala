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
    */
  def maintain(spark: SparkSession, batch: DataFrame, root: String,
               partCols: Seq[String], keyCols: Seq[String],
               valueCol: String): Int = {
    require(partCols.nonEmpty && partCols.forall(keyCols.contains),
      s"partCols $partCols must be a subset of keyCols $keyCols")
    // sum(decimal(18,2)) widens to decimal(28,2); pin the STORED type to
    // decimal(18,2) here so every batch writes the same parquet encoding
    // (mixed widths across partitions break later schema-inferred reads)
    val partial = batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(18, 2))).cast(DecimalType(18, 2)).as("sum_v"))

    val touched: Array[Row] = partial.select(partCols.map(col): _*).distinct().collect()
    if (touched.isEmpty) return 0

    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = fs.exists(new org.apache.hadoop.fs.Path(root))
    val merged = if (existing) {
      // literal disjunction over the touched tuples → static partition pruning
      val pruning = touched.map { r =>
        partCols.zipWithIndex.map { case (c, i) => col(c) === lit(r.get(i)) }
          .reduce(_ && _)
      }.reduce(_ || _)
      val current = spark.read.parquet(root).filter(pruning)
        .select(partial.columns.toIndexedSeq.map(col): _*) // align column order for the union
      partial.unionByName(current)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col("n")).cast("long").as("n"),
          sum(col("sum_v")).cast(DecimalType(18, 2)).as("sum_v"))
    } else partial

    // cut lineage: the write below must not plan a read of `root`
    merged.localCheckpoint(eager = true)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(root)
    touched.length
  }

  /** Read the maintained aggregate with derived columns (mean). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val t = spark.read.parquet(root)
    t.withColumn("mean_v",
      (col("sum_v").cast("double") / col("n")))
  }
}
