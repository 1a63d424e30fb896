package graft.sinks

import org.apache.spark.sql.DataFrame
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
    df.drop(complex: _*)
  }

  /** One output file per (partition-tuple) instead of one per task —
    * the small-file guard for wide-task / low-cardinality-partition
    * writes. A shuffle on the partition columns, then partitionBy.
    */
  def repartitionByPartitionColumns(df: DataFrame,
                                    partitionCols: Seq[String] = defaultPartitionCols): DataFrame =
    df.repartition(partitionCols.map(col): _*)
}
