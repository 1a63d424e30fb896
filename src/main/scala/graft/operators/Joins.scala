package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-mitigation joins for 100 TB fact tables.
  *
  * The first tool for a skewed shuffle join is AQE's runtime skew-join
  * splitting (on by default in [[graft.GraftSession]]); the second is a
  * broadcast when the dimension fits. Salting is the third: when the
  * dimension is too big to broadcast AND the skew is known/extreme (a
  * handful of hot keys holding most of the fact rows — a hot camera, a
  * null-ish default key), pre-splitting the hot key across `factor`
  * shuffle partitions bounds the largest task deterministically, at plan
  * time, rather than trusting runtime re-splits.
  *
  * Mechanics: the fact side gets a deterministic per-row salt in
  * `[0, factor)`; the dimension side is replicated `factor` times (one
  * copy per salt value — dimension rows are the SMALL side of the salt
  * trade); the equi-join adds the salt to the key list, so each hot key's
  * rows spread over `factor` reducers instead of one.
  */
object Joins {

  /** Salted equi-join. `saltOf` must be a deterministic per-fact-row
    * expression (e.g. `hash(fact primary key)`) — determinism keeps
    * results replay-stable and oracle-checkable; entropy, not semantics,
    * is all the salt needs. `factor` multiplies the dimension's row count
    * and should track the hot key's share of rows over the average
    * (8–64 in practice), not cluster size.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltOf: Column, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    // the dimension is replicated: an unmatched dim row exists `factor`
    // times, so any join type that EMITS unmatched dim rows (right/full)
    // would duplicate them — fact-preserving types only
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")(normalized),
      s"saltedJoin supports fact-preserving join types (inner/left/semi/anti), got: $joinType")
    val salted = facts.withColumn("__salt", pmod(saltOf, lit(factor)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** As-of join: every left row picks the single right row with the same
    * key nearest in time on the chosen side, or nulls if none exists —
    * the time-series/versioned-dimension join SQL can only express as a
    * correlated LATERAL subquery. `direction = "backward"` (default)
    * matches the greatest right-time ≤ left-time, ties on right-time
    * resolved by the GREATEST `tieBreak`; `direction = "forward"`
    * matches the least right-time ≥ left-time, ties resolved by the
    * LEAST `tieBreak` (the exact mirror).
    *
    * Spark-first plan (the distributed analogue of a sorted merge): ONE
    * shuffle — left and right rows union-tagged, hash-partitioned by
    * key, sorted per key by (time, side, tieBreak), and a SINGLE struct
    * of all right value columns forward-filled with a running
    * `last(ignoreNulls)` window; left rows then project the struct's
    * fields. Filling one struct (not each column independently) keeps
    * every projected value from the SAME matched right row — a right
    * row with a null in one value column must surface that null, not a
    * stale value stitched in from an older row. No correlated per-row
    * probe, no range cross-join: cost is a sort per key partition,
    * identical to any windowed aggregation at 100 TB. The forward
    * direction is the SAME plan with the time ordering reversed (nulls
    * kept first so a null left time still matches nothing). Right rows
    * sort BEFORE left rows at equal times either way, so "at-or-before"
    * / "at-or-after" include exact-time matches.
    *
    * Hot keys: a key holding most of the rows lands its whole sort in
    * one task, and salt cannot help (the fill must see every right row
    * of the key). `timeBucket > 0` is the escape hatch: rows are
    * windowed within (key, floor(time / timeBucket)) — each task bounded
    * by a key's rows per bucket — and matches that cross a bucket
    * boundary are stitched by a per-(key, bucket) carry: the winning
    * right row of each bucket, forward-filled ACROSS the key's bucket
    * list (a window over #buckets rows, not #rows) and joined back.
    * Results are identical to the single-window plan when the tieBreak
    * is unique per (key, time) — the uniqueness every deterministic
    * as-of needs anyway.
    *
    * Requirements: `leftTime`/`rightTime` must be mutually comparable
    * (cast before calling); non-key column names must not overlap; a
    * null left time yields nulls (no match), null right times never
    * match. With `timeBucket > 0`, times must be numeric (bucket
    * arithmetic) and right value columns orderable (the carry winner is
    * a struct max/min).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               tieBreak: String, direction: String = "backward",
               timeBucket: Long = 0L): DataFrame = {
    val rightVals = right.columns.filterNot(c => keys.contains(c) || c == rightTime)
    require(rightVals.contains(tieBreak),
      s"tieBreak '$tieBreak' must be a carried (non-key, non-time) right column")
    val overlap = left.columns.toSet.intersect(rightVals.toSet)
    require(overlap.isEmpty,
      s"left/right non-key columns overlap: ${overlap.mkString(", ")} — rename before joining")
    val backward = direction.toLowerCase match {
      case "backward" => true
      case "forward"  => false
      case other => throw new IllegalArgumentException(
        s"direction must be 'backward' or 'forward', got: $other")
    }
    // both orderings put null left times FIRST (before any right row, so
    // they match nothing) and right rows before left rows at equal times
    val timeOrder =
      if (backward) Seq(col("__t").asc_nulls_first, col("__side").asc, col(tieBreak).asc)
      else Seq(col("__t").desc_nulls_first, col("__side").asc, col(tieBreak).desc)

    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val r = right.withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
      .drop(rightTime)
    val u = l.unionByName(r, allowMissingColumns = true)
      .filter(col("__side") === 1 || col("__t").isNotNull)
    // one struct per RIGHT row (null for left rows, so ignoreNulls skips
    // them); the fill then carries whole matched rows, never a per-column
    // mix of different right rows
    val rightRow = when(col("__side") === 0,
      struct(rightVals.toIndexedSeq.map(col): _*))

    val filled =
      if (timeBucket <= 0L) {
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(timeOrder: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn("__asof", last(rightRow, ignoreNulls = true).over(w))
      } else {
        // exact floor division, negative-safe: pmod is always >= 0
        val bkt = ((col("__t") - pmod(col("__t"), lit(timeBucket))) / timeBucket)
          .cast("long")
        val ub = u.withColumn("__bkt", bkt)
        val bktCols = (keys :+ "__bkt").map(col)
        // 1. fill within (key, bucket) — the task-bounding window
        val wIn = Window.partitionBy(bktCols: _*).orderBy(timeOrder: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val inFill = ub.withColumn("__near", last(rightRow, ignoreNulls = true).over(wIn))
        // 2. the right row each bucket would hand to later (earlier, for
        //    forward) buckets: lexicographic max/min over (t, tieBreak)
        //    — exactly the in-bucket fill's winner at bucket end.
        //    Aggregated FROM the window's output, not the raw union: the
        //    rows are already hash-partitioned on (keys, __bkt) there, so
        //    the groupBy adds no Exchange and the union is computed once
        val winner = when(col("__side") === 0,
          struct(col("__t"), col(tieBreak).as("__tie"),
            struct(rightVals.toIndexedSeq.map(col): _*).as("v")))
        val summary = inFill.groupBy(bktCols: _*)
          .agg((if (backward) max(winner) else min(winner)).as("__w"))
        // 3. forward-fill winners across each key's bucket LIST (rows =
        //    #buckets, metadata-bounded); strictly-previous frame keeps
        //    same-bucket matches to step 1
        val bktOrder = if (backward) col("__bkt").asc_nulls_first
          else col("__bkt").desc_nulls_first
        val wCarry = Window.partitionBy(keys.map(col): _*).orderBy(bktOrder)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carries = summary
          .withColumn("__carry", last(col("__w"), ignoreNulls = true).over(wCarry))
          .select(keys.zipWithIndex.map { case (k, i) => col(k).as(s"__ck$i") } ++
            Seq(col("__bkt").as("__cbkt"), col("__carry").getField("v").as("__cv")): _*)
        // 4. stitch: null-safe equi-join (null keys/buckets must behave
        //    like the window's null partitions, not drop)
        val cond = keys.zipWithIndex.map { case (k, i) => col(k) <=> col(s"__ck$i") }
          .reduce(_ && _) && (col("__bkt") <=> col("__cbkt"))
        inFill.join(carries, cond, "left")
          .withColumn("__asof", coalesce(col("__near"), col("__cv")))
      }
    filled.filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightVals.map(c => col("__asof").getField(c).as(c)): _*)
  }

  /** Bucketed range join: each point row pairs with every interval row
    * whose `[lo, hi]` contains its point (inclusive on both ends;
    * intervals may overlap — a point then matches several).
    *
    * Spark plans a raw `p BETWEEN lo AND hi` join as a nested-loop
    * (BroadcastNestedLoopJoin) — quadratic, the classic 100 TB killer.
    * Bucketizing turns it into an EQUI-join: intervals explode to one
    * row per `bucketWidth`-sized bucket they touch, points map to the
    * single bucket they fall in, the join runs on the bucket key, and
    * the exact containment predicate filters survivors. Each matching
    * (point, interval) pair meets exactly once — in the point's own
    * bucket — so no dedup is needed.
    *
    * `bucketWidth` trades replication for selectivity: intervals
    * replicate `ceil(span/width)+1`-ish times (keep width near the
    * median interval span); a width far above every span degrades to
    * per-bucket mini cross-products. Degenerate rows (null or inverted
    * lo/hi, null points) match nothing rather than corrupting buckets.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"point/interval columns overlap: ${overlap.mkString(", ")} — rename before joining")

    // NaN/±Inf would throw in the ANSI long cast — such rows can never
    // satisfy the containment predicate anyway, so they bucket to null
    // (points, dropped by the inner join) or are filtered out (intervals)
    def finite(c: Column): Column =
      c.isNotNull && !isnan(c) &&
        c > lit(Double.NegativeInfinity) && c < lit(Double.PositiveInfinity)
    val pv = col(pointCol)
    val p = points.withColumn("__bucket",
      when(finite(pv), floor(pv / bucketWidth).cast("long")))
    val i = intervals
      .filter(finite(col(loCol)) && finite(col(hiCol)) && col(loCol) <= col(hiCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
