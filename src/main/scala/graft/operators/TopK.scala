package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Bounded top-k per key via a heap aggregate instead of a window rank.
  *
  * This aggregates with a bounded priority queue that merges map-side:
  * each shuffle carries at most k rows per key per partition and NO sort
  * happens anywhere in the plan. (Spark's own `InferWindowGroupLimit`
  * achieves the same shuffle volume for the `row_number <= k` filter
  * pattern since 3.5, but still sorts on both sides of the exchange —
  * the heap's advantage is memory/spill behavior on wide partitions,
  * and availability as a direct aggregation API rather than a plan
  * pattern.) Same output contract as the window formulation when `ord`
  * is a total order (add tie-break columns to the struct); proven by
  * hash-matching the row_number oracle (q32 ≡ q11).
  */
object TopK {

  /** Top-k rows per key, ranked by `ord` ASCENDING (wrap columns in a
    * `struct(...)` for compound orders; negate for descending fields).
    * Returns `keyCols ++ payloadCols ++ rk` with rk in 1..k.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], ord: Column,
                 payloadCols: Seq[String], k: Int): DataFrame = {
    val item = struct(ord.as("__ord") +: payloadCols.map(p => col(p).as(p)): _*)
    df.groupBy(keyCols.map(col): _*)
      // reverse = true -> keep k SMALLEST by the struct ordering,
      // returned ascending = rank order
      .agg(ColumnBridge.collectTopK(item, k, reverse = true).as("__top"))
      .select(keyCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__row")): _*)
      .select(keyCols.map(col) ++ payloadCols.map(p => col(s"__row.$p").as(p)) :+
        (col("__pos") + 1).cast("long").as("rk"): _*)
  }

  /** Per-key mode — the most frequent `valueCol`, ties broken toward
    * the GREATEST value so the answer is deterministic (SQL's `mode()`
    * leaves tie order unspecified; an unspecified mode silently differs
    * between runs and engines). Two partial-aggregating shuffles and
    * zero windows: the (key, value) count collapses first, then
    * `max(struct(count, value))` picks the winner — a struct max merges
    * map-side, so the second exchange carries ONE row per key per
    * partition, where the row_number-over-count formulation would
    * shuffle every distinct value and sort each key's partition.
    * Returns (keyCols, `mode_<valueCol>`, `n` = the winner's count).
    */
  def modePerKey(df: DataFrame, keyCols: Seq[String],
                 valueCol: String): DataFrame = {
    val counts = df.groupBy((keyCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    counts.groupBy(keyCols.map(col): _*)
      .agg(max(struct(col("__cnt"), col(valueCol))).as("__m"))
      .select(keyCols.map(col) :+
        col(s"__m.$valueCol").as(s"mode_$valueCol") :+
        col("__m.__cnt").as("n"): _*)
  }
}
