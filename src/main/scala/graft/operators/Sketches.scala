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
