package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators (`flatMapGroupsWithState`) — the
  * capability the reference approximates with its per-topic in-memory
  * buffers and crash-replay double-writes (SURVEY §7.4 "exactly-once"):
  * the reference can emit duplicate rows when offsets are replayed after
  * a crash (`run.py` commits offsets independently of S3 uploads). Here
  * replay-dedup is a first-class streaming operator with bounded
  * watermark-driven state instead of an operational accident.
  */
object StatefulOps {

  case class KeyedEvent(entity: String, event_id: Long, ts: java.sql.Timestamp)
  case class DedupState(seen: Set[Long])

  /** Drop events whose (entity, event_id) was already seen — streaming
    * exactly-once semantics over an at-least-once source.
    *
    * `stateTtlMs > 0` expires per-entity state via processing-time
    * timeout so memory is bounded by the replay horizon, not the stream
    * length — use it for daemon mode. Leave it 0 for bounded drains
    * (`Trigger.AvailableNow` runs): timeout scheduling keeps firing
    * empty maintenance micro-batches, which a finite drain never wants.
    */
  def dedupByKey(events: Dataset[KeyedEvent],
                 stateTtlMs: Long = 0L): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.entity)
      .flatMapGroupsWithState[DedupState, KeyedEvent](OutputMode.Append(), timeout) {
        case (_, rows, state: GroupState[DedupState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.map(_.seen).getOrElse(Set.empty[Long])
            val fresh = rows.filterNot(r => seen.contains(r.event_id)).toVector
            state.update(DedupState(seen ++ fresh.map(_.event_id)))
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            fresh.iterator
          }
      }
  }

  /** Streaming debounce — the stateful twin of the batch
    * [[graft.operators.TimeSeries.debounce]] (q142): per key, emit an
    * event only when it arrives more than `gapMs` after the LAST
    * SEEN event — chained chatter re-arms the suppression window, the
    * batch operator's exact gap-chained-burst semantics. State is one
    * long per key; `stateTtlMs` bounds it by the chatter horizon for
    * daemon mode (same contract as [[dedupByKey]]).
    *
    * In-order delivery per key is assumed within a micro-batch (the
    * rows iterator is sorted here, cross-batch order comes from the
    * source); a late event older than the last seen one counts as
    * chatter.
    */
  case class DebounceState(lastSeen: Long)

  def debounceByKey(events: Dataset[KeyedEvent], gapMs: Long,
                    stateTtlMs: Long = 0L): Dataset[KeyedEvent] = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    import events.sparkSession.implicits._
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.entity)
      .flatMapGroupsWithState[DebounceState, KeyedEvent](OutputMode.Append(), timeout) {
        case (_, rows, state: GroupState[DebounceState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(DebounceState(Long.MinValue))
            val out = Vector.newBuilder[KeyedEvent]
            // full-microsecond epoch (getTime is ms-truncated; the sub-ms
            // micros live in getNanos) — the batch twin compares
            // unix_micros, so the streaming side must too
            def micros(ts: java.sql.Timestamp): Long =
              ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
            rows.toVector.sortBy(r => (micros(r.ts), r.event_id)).foreach { r =>
              val t = micros(r.ts)
              // leader iff the gap since the last SEEN event is open —
              // the batch operator's exact break predicate
              if (st.lastSeen == Long.MinValue || t - st.lastSeen > gapMs * 1000L)
                out += r
              st = DebounceState(math.max(st.lastSeen, t))
            }
            state.update(st)
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.result().iterator
          }
      }
  }

  /** Event-time tumbling-window aggregation with a watermark — the
    * streaming twin of the batch Q15 (`SparkEntry.q15`). Late rows beyond
    * `lateness` are dropped and state for closed windows is reclaimed.
    */
  def hourlyCounts(events: DataFrame, tsCol: String = "ts",
                   keyCol: String = "event_type",
                   lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), "1 hour"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col(keyCol), col("n"))

  /** Event-time SESSION windows: activity bursts per key separated by
    * `gap` of silence, computed with Spark's native `session_window`
    * (dynamic merging windows + watermark state eviction) — the
    * streaming twin of the batch lag/cumsum sessionization (q33). Append
    * mode emits a session only once its window is older than the
    * watermark, i.e. once it can no longer grow.
    */
  def sessionCounts(events: DataFrame, tsCol: String = "ts",
                    keyCol: String = "entity", gap: String = "30 minutes",
                    lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("sstart"),
        col("session_window.end").as("send"), col(keyCol), col("n"))

  case class Reading(entity: String, seq: Long, value: Double)
  case class RollingState(n: Long, sum: Double, sumSq: Double)
  case class Scored(entity: String, seq: Long, value: Double,
                    zscore: Option[Double], is_anomaly: Boolean)

  /** Streaming rolling z-score — the stateful twin of the batch
    * [[graft.operators.TimeSeries.rollingZscore]]: each reading is
    * scored against the running mean/std of everything its key has seen
    * so far (Welford-style accumulation in O(1) state per key: count,
    * sum, sum of squares — NOT a buffer of past rows, so state size is
    * independent of stream length; `stateTtlMs` bounds idle-key
    * lifetime for daemon mode). Rows inside one micro-batch are scored
    * in `seq` order so replaying a drained stream reproduces identical
    * scores regardless of batch boundaries.
    */
  def rollingAnomalies(readings: Dataset[Reading], threshold: Double = 2.0,
                       stateTtlMs: Long = 0L): Dataset[Scored] = {
    import readings.sparkSession.implicits._
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    readings
      .groupByKey(_.entity)
      .flatMapGroupsWithState[RollingState, Scored](OutputMode.Append(), timeout) {
        case (_, rows, state: GroupState[RollingState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(RollingState(0L, 0.0, 0.0))
            val out = rows.toVector.sortBy(_.seq).map { r =>
              // score against the state BEFORE this reading joins it
              val z =
                if (st.n >= 2) {
                  val mean = st.sum / st.n
                  val variance = (st.sumSq - st.sum * st.sum / st.n) / (st.n - 1)
                  if (variance > 0)
                    Some(math.round((r.value - mean) / math.sqrt(variance) * 1e6) / 1e6.toDouble)
                  else None
                } else None
              st = RollingState(st.n + 1, st.sum + r.value,
                st.sumSq + r.value * r.value)
              Scored(r.entity, r.seq, r.value, z, z.exists(v => math.abs(v) > threshold))
            }
            state.update(st)
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.iterator
          }
      }
  }

  /** Stream-STREAM inner join on a key plus an event-time interval:
    * right rows match a left row when `rightTs ∈ [leftTs - before,
    * leftTs + after]` — the correlation join (clicks→impressions,
    * readings→alerts) that batch q42 does with buckets, expressed on
    * two live streams.
    *
    * Both sides carry a watermark and the join condition bounds
    * right-time relative to left-time in BOTH directions — that pair is
    * what lets Spark compute a state-eviction horizon: each side
    * buffers only rows younger than watermark + interval, so state is
    * bounded by rate × (lateness + interval), not stream length. An
    * unbounded condition (or a missing watermark) would accumulate
    * state forever — the #1 stream-stream join operational failure at
    * scale. Join keys must be named identically on both sides
    * (`usingColumns` join, so the key appears once in the output).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   before: String, after: String,
                   lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    val bound =
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $before") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $after")
    l.join(r, keys, "inner").where(bound)
  }
}
