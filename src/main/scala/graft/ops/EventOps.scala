package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's per-batch transform pipeline (SURVEY.md §2, E3) as
  * composable `DataFrame => DataFrame` functions. Each function cites the
  * reference operator it re-expresses; semantics implement the evident
  * *intent* (SURVEY §7.4) — e.g. half-open month ranges instead of the
  * reference's boundary-dropping strict comparisons (`df_manager.py:69-75`).
  */
object EventOps {

  /** O3 — JSON deserialization (`run.py:45`). Decode a Kafka-shaped
    * `value` binary/string column against an explicit schema; malformed
    * rows become null structs (poll-error analogue, `run.py:40-42`).
    */
  def decodeJson(df: DataFrame, schema: StructType, valueCol: String = "value"): DataFrame =
    df.withColumn("record", from_json(col(valueCol).cast("string"), schema))

  /** O4 — schema patch / default column (`run.py:48-50`): missing
    * `hit_counts` defaults to `size(locations)`.
    */
  def patchHitCounts(df: DataFrame,
                     hits: String = "hit_counts",
                     locations: String = "locations"): DataFrame =
    df.withColumn(hits, coalesce(col(hits), size(col(locations))))

  /** O9 — drop records lacking a timestamp (`df_manager.py:36-38`). */
  def filterHasTimestamp(df: DataFrame, ts: String = "ts"): DataFrame =
    df.filter(col(ts).isNotNull)

  /** O14 — exclude epoch-garbage rows bucketed into 1970
    * (`df_manager.py:67-68`).
    */
  def filterEpochGarbage(df: DataFrame, ts: String = "ts"): DataFrame =
    df.filter(year(col(ts)) =!= 1970)

  /** O18 — exclude rows whose partition key is null/"nan"
    * (`df_manager.py:104-105`).
    */
  def filterValidKey(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNotNull && col(key) =!= "nan" && col(key) =!= "NaN")

  /** O12 — derived event-time column (`df_manager.py:55-58`): epoch-ms
    * Long → TimestampType. The reference calls this `timestamp-iso`.
    */
  def deriveEventTime(df: DataFrame,
                      epochMs: String = "timestamp",
                      out: String = "ts"): DataFrame =
    df.withColumn(out, timestamp_millis(col(epochMs)))

  /** O13/O15/O16 — the year/month partition columns that subsume the
    * reference's month-slicing + per-key fan-out loops
    * (`df_manager.py:60-80`): one declarative `partitionBy` replaces the
    * O(months × keys) driver-side loop.
    */
  def withPartitionColumns(df: DataFrame, ts: String = "ts"): DataFrame =
    df.withColumn("year", year(col(ts)))
      .withColumn("month", month(col(ts)))

  /** O15 intent — half-open time-range predicate `[start, end)`. Fixes the
    * reference's strict-comparison month-boundary bug (`df_manager.py:70-74`
    * drops day-1 and last-day rows).
    */
  def rangeFilter(df: DataFrame, ts: String, startIncl: String, endExcl: String): DataFrame =
    df.filter(col(ts) >= lit(startIncl).cast("timestamp") &&
              col(ts) <  lit(endExcl).cast("timestamp"))

  /** The full valid-row gate the sink pipeline applies (O9 + O14 + O18). */
  def filterValid(df: DataFrame, ts: String = "ts", key: Option[String] = None): DataFrame = {
    val base = filterEpochGarbage(filterHasTimestamp(df, ts), ts)
    key.fold(base)(k => filterValidKey(base, k))
  }

  /** O13 — distinct months present in a batch (`df_manager.py:60-62`);
    * retained as an observable query even though `partitionBy` subsumes it.
    */
  def distinctMonths(df: DataFrame, ts: String = "ts"): DataFrame =
    df.select(date_format(col(ts), "yyyy-MM").as("ym")).distinct()

  /** O19 — append/accumulate (`df_manager.py:85-90`): read-modify-write
    * becomes a pure union; sink-level append mode replaces file rewrite.
    */
  def append(old: DataFrame, fresh: DataFrame): DataFrame =
    old.unionByName(fresh, allowMissingColumns = true)

  /** Dimension enrichment — the "enrich" half of the pipeline's
    * clean/enrich contract: left-join a dimension table onto the event
    * stream. Works identically on micro-batches inside `foreachBatch`
    * (stream-static join) and in batch queries. No broadcast hint:
    * callers pass dims of unknown scale (q38's is customer, which
    * grows WITH the fact side), and a forced hint would both pin a
    * driver OOM at lake scale and disable AQE's size-based choice —
    * AQE broadcasts automatically while the dim fits.
    */
  def enrich(events: DataFrame, dim: DataFrame, joinCols: Seq[String]): DataFrame =
    events.join(dim, joinCols, "left")
}
