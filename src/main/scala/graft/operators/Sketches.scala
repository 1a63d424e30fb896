package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.HashFamilies

/** Mergeable frequency sketches: Count-Min (Cormode & Muthukrishnan,
  * "An improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 2005) as a typed [[Aggregator]] — the
  * shape that matters at 100 TB is MERGEABILITY: each partition builds
  * its own depth × width counter grid, the shuffle moves one grid per
  * partition (KB–MB metadata, independent of row count), and grids add
  * elementwise. The same property lets sketches persist per file/day
  * and answer later queries by merging, without re-reading the data.
  *
  * Estimates are deterministic for a fixed seed (the affine hash family
  * of [[HashFamilies]]), never UNDER the true count, and over by at
  * most ~e·N/width with probability 1 − e^-depth.
  */
object Sketches {

  /** depth × width Count-Min over Long keys, flattened row-major. */
  class CountMinAggregator(depth: Int, width: Int, seed: Long)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2; got $depth x $width")
    @transient private lazy val as = HashFamilies.multipliers(depth, seed)
    @transient private lazy val bs = HashFamilies.offsets(depth, seed)

    @inline private def slot(d: Int, x: Long): Int = {
      val h = x * as(d) + bs(d)
      // top bits of the affine hash — low bits of a*x are weak mod 2^64
      (((h >>> 33) % width).toInt + width) % width
    }

    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], x: Long): Array[Long] = {
      var d = 0
      while (d < depth) { b(d * width + slot(d, x)) += 1L; d += 1 }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Build the sketch of `keyCol` (cast to long) in one pass. Returns
    * the flattened grid — driver-side metadata sized depth × width.
    */
  def countMin(df: DataFrame, keyCol: String, depth: Int = 4,
               width: Int = 2048, seed: Long = 42L): Array[Long] = {
    val agg = udaf(new CountMinAggregator(depth, width, seed),
      ExpressionEncoder[Long]())
    df.select(col(keyCol).cast("long").as("k"))
      .filter(col("k").isNotNull)
      .select(agg(col("k")).as("sk"))
      .head().getSeq[Long](0).toArray
  }

  /** Point estimate from a built sketch: min over the key's slots. */
  def estimate(sketch: Array[Long], depth: Int, width: Int, seed: Long,
               key: Long): Long = {
    val as = HashFamilies.multipliers(depth, seed)
    val bs = HashFamilies.offsets(depth, seed)
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val h = key * as(d) + bs(d)
      val s = (((h >>> 33) % width).toInt + width) % width
      val v = sketch(d * width + s)
      if (v < best) best = v
      d += 1
    }
    best
  }

  /** Equi-join cardinality estimate from two Count-Min sketches built
    * with the SAME (depth, width, seed): `|R ⋈ S| = Σ_k f_R(k)·f_S(k)`
    * is estimated by `min_d ⟨row_d(A), row_d(B)⟩` (Cormode &
    * Muthukrishnan 2005, §4.2; the AGM-style inner-product estimator).
    * Never under the true size; over by ≤ e·N_R·N_S/width per row with
    * probability 1 − e^−depth — the join-size oracle a planner consults
    * BEFORE committing a join order or a broadcast decision, at the
    * cost of two one-pass KB-size sketches instead of a real join.
    */
  def cmsJoinSize(a: Array[Long], b: Array[Long], depth: Int,
                  width: Int): Long = {
    require(a.length == depth * width && b.length == a.length,
      s"sketch shape mismatch: ${a.length} vs ${b.length} vs $depth x $width")
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      var dot = 0L
      var i = d * width
      val end = i + width
      while (i < end) { dot += a(i) * b(i); i += 1 }
      if (dot < best) best = dot
      d += 1
    }
    best
  }

  /** Mergeable quantile sketch over POSITIVE doubles — the DDSketch
    * design (Masson, Rim & Lee, "DDSketch: a fast and fully-mergeable
    * quantile sketch with relative-error guarantees", VLDB 2019):
    * value → geometric bucket `ceil(ln v / ln γ)`, sketch = bucket →
    * count map. Unlike KLL/GK, the bucket of a value is a PURE
    * FUNCTION of the value, so merges are plain count additions —
    * fully order-independent (Spark task completion order cannot
    * change a bit) — and the estimate for rank r (the bucket midpoint
    * `2γ^b/(γ+1)` of the bucket containing r) carries a guaranteed
    * RELATIVE error ≤ α = (γ−1)/(γ+1) against the true order
    * statistic. `StrictMath.log` keeps bucketing bit-identical across
    * heterogeneous executor JDKs. State: one count per OCCUPIED
    * bucket — γ=1.02 spans 9 decades in ~1000 buckets (~16 KB per
    * partition through the shuffle, the [[CountMinAggregator]]
    * mergeability contract).
    */
  class DdSketchAggregator(gamma: Double)
      extends Aggregator[Double, scala.collection.mutable.HashMap[Int, Long],
                         Map[Int, Long]] {
    require(gamma > 1.0 && gamma < 2.0, s"need 1 < gamma < 2, got $gamma")
    @transient private lazy val invLnGamma = 1.0 / StrictMath.log(gamma)
    override def zero: scala.collection.mutable.HashMap[Int, Long] =
      scala.collection.mutable.HashMap.empty
    override def reduce(b: scala.collection.mutable.HashMap[Int, Long],
                        v: Double): scala.collection.mutable.HashMap[Int, Long] = {
      if (v > 0 && !v.isInfinite && !v.isNaN) {
        val k = math.ceil(StrictMath.log(v) * invLnGamma).toInt
        b.update(k, b.getOrElse(k, 0L) + 1L)
      }
      b
    }
    override def merge(x: scala.collection.mutable.HashMap[Int, Long],
                       y: scala.collection.mutable.HashMap[Int, Long])
        : scala.collection.mutable.HashMap[Int, Long] = {
      y.foreach { case (k, n) => x.update(k, x.getOrElse(k, 0L) + n) }
      x
    }
    override def finish(b: scala.collection.mutable.HashMap[Int, Long]): Map[Int, Long] =
      b.toMap
    override def bufferEncoder: Encoder[scala.collection.mutable.HashMap[Int, Long]] =
      ExpressionEncoder[scala.collection.mutable.HashMap[Int, Long]]()
    override def outputEncoder: Encoder[Map[Int, Long]] =
      ExpressionEncoder[Map[Int, Long]]()
  }

  /** Rank-`r` (1-based) estimate from a DDSketch bucket map: midpoint
    * of the bucket containing the r-th smallest value.
    */
  def ddEstimate(buckets: Map[Int, Long], r: Long, gamma: Double): Double = {
    require(r >= 1, s"rank must be >= 1, got $r")
    val sorted = buckets.toSeq.sortBy(_._1)
    var cum = 0L
    for ((k, n) <- sorted) {
      cum += n
      if (cum >= r) return 2.0 * StrictMath.pow(gamma, k) / (gamma + 1.0)
    }
    if (sorted.nonEmpty)
      2.0 * StrictMath.pow(gamma, sorted.last._1) / (gamma + 1.0)
    else Double.NaN
  }

  /** Per-group quantile ESTIMATES from one mergeable-sketch pass:
    * `(groupCol, q_pct, n, est)` for each requested percentile (rank
    * `ceil(n·q/100)` — the discrete order-statistic convention). The
    * group key keeps its NATIVE type — the estimate is evaluated by
    * the [[graft.functions.DdEstimate]] expression over the bucket
    * map, so no typed row shape ever forces a cast. The scan shuffles
    * one bucket map per (partition, group); nothing downstream grows
    * with the rows. Guarantee: `|est − x_(r)| ≤ α·x_(r)` with
    * α = (γ−1)/(γ+1) — q183 checks it row by row against the exact
    * order statistic.
    */
  def ddQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                  qPcts: Seq[Int], gamma: Double = 1.02): DataFrame = {
    require(qPcts.nonEmpty && qPcts.forall(q => q >= 1 && q <= 100),
      s"percentiles must be in [1, 100], got $qPcts")
    val agg = udaf(new DdSketchAggregator(gamma), ExpressionEncoder[Double]())
    df.select(col(groupCol).as("__g"), col(valueCol).cast("double").as("v"))
      // finite-positive only, matching DdSketchAggregator.reduce exactly:
      // admitting +Inf into n but not the sketch would push rank targets
      // past the sketch mass and silently return the top bucket
      .filter(col("v").isNotNull && col("v") > 0 && !isnan(col("v")) &&
        col("v") =!= Double.PositiveInfinity)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), agg(col("v")).as("__sk"))
      .select(col("__g"), col("n"), col("__sk"),
        explode(lit(qPcts.map(_.toLong).toArray)).as("q_pct"))
      // rank ceil(n·q/100) in pure integer arithmetic (n ≥ 1 ⇒ r ≥ 1)
      .withColumn("est", graft.functions.SketchFunctions.ddEstimate(
        col("__sk"), expr("CAST((n * q_pct + 99) DIV 100 AS BIGINT)"), gamma))
      .select(col("__g").as(groupCol), col("q_pct"), col("n"), col("est"))
  }

  /** Mergeable Bloom build over Long keys: each partition ORs into its
    * own bit array, the shuffle moves one array per partition (KB
    * metadata), arrays OR associatively — the same mergeability
    * contract as [[CountMinAggregator]]. Slot math lives in
    * [[graft.functions.BloomBits]], shared with the probe expression.
    */
  class BloomAggregator(numLongs: Int, numHashes: Int, seed: Long)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numLongs >= 1 && numHashes >= 1,
      s"need numLongs >= 1, numHashes >= 1; got $numLongs, $numHashes")
    override def zero: Array[Long] = new Array[Long](numLongs)
    override def reduce(b: Array[Long], x: Long): Array[Long] = {
      graft.functions.BloomBits.add(b, numHashes, seed, x); b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Build the Bloom bits of `keyCol` (long) in one distributed pass. */
  def bloomOf(df: DataFrame, keyCol: String, numLongs: Int,
              numHashes: Int = 5, seed: Long = 42L): Array[Long] = {
    val agg = udaf(new BloomAggregator(numLongs, numHashes, seed),
      ExpressionEncoder[Long]())
    df.select(col(keyCol).cast("long").as("k"))
      .filter(col("k").isNotNull)
      .select(agg(col("k")).as("bits"))
      .head().getSeq[Long](0).toArray
  }

  /** [[bloomOf]] for a WIDE filter (MBs): every build task emits a full
    * m-byte partial, so the aggregate moves `#tasks · m` bytes no
    * matter how it is arranged — the lever is the NUMBER of build
    * tasks, not the tree shape. A shuffle-free `coalesce` caps the
    * partial count (hashing is cheap next to m-byte partial traffic),
    * and a depth-2 `treeAggregate` keeps any single reducer's fan-in
    * bounded when `maxBuildTasks` is raised for very large builds.
    * Same bits as [[bloomOf]], same probe.
    */
  def bloomOfTree(df: DataFrame, keyCol: String, numLongs: Int,
                  numHashes: Int = 5, seed: Long = 42L,
                  maxBuildTasks: Int = 8): Array[Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("k"))
      .filter(col("k").isNotNull)
      .coalesce(maxBuildTasks)
      .as[Long].rdd
      .treeAggregate(new Array[Long](numLongs))(
        seqOp = (b, x) => { graft.functions.BloomBits.add(b, numHashes, seed, x); b },
        combOp = (x, y) => {
          var i = 0
          while (i < x.length) { x(i) |= y(i); i += 1 }
          x
        },
        depth = 2)
  }

  /** Exact top-k keys with their sketch estimates alongside — the
    * validation face: `(key, exact, est)` with `est >= exact`
    * guaranteed. The sketch is ONE pass + one grid per partition; the
    * exact side is the usual count-shuffle. At 100 TB the sketch pass
    * is what a monitoring pipeline keeps; the exact side exists here to
    * expose the error empirically.
    */
  def heavyHittersWithEstimates(df: DataFrame, keyCol: String, k: Int,
                                depth: Int = 4, width: Int = 2048,
                                seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sketch = countMin(df, keyCol, depth, width, seed)
    val top = df.select(col(keyCol).cast("long").as("key"))
      .filter(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("key").asc)
      .limit(k)
      .as[(Long, Long)].collect()
    top.toSeq.map { case (key, exact) =>
      (key, exact, estimate(sketch, depth, width, seed, key))
    }.toDF("key", "exact", "est")
  }
}
