package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{NumFunctions, TextFunctions}

/** Learned document-quality classifier — the trained filter every major
  * LLM corpus pipeline ranks documents with (CCNet's LM filter, the
  * GPT-3 / LLaMA logistic-regression quality classifiers; Wenzek et
  * al. 2019, Brown et al. 2020, Touvron et al. 2023): a linear model
  * over hashed bag-of-words features (Weinberger et al. 2009 feature
  * hashing), trained by full-batch gradient descent under a
  * hard-sigmoid link (Collobert 2004 — the piecewise-linear logistic
  * surrogate), here in EXACT FIXED-POINT arithmetic.
  *
  * Determinism contract (the [[Graph.pageRank]] recipe): float
  * addition does not commute across Spark's merge orders, and a
  * trained weight that differs in the last ulp is a different
  * classifier. All model state is therefore fixed-point 64-bit integer
  * ([[Scale]] units = probability/weight 1.0):
  *  - the feature bucket is the first 6 hex digits of `md5(token)` mod
  *    `dim` — exact on any engine that ships md5 (the q120 sample-key
  *    precedent);
  *  - the link is `p = (2S + clamp(z, ±2S)) div 4` — the hard sigmoid
  *    `σ(t) = clip(1/2 + t/4, 0, 1)` in units, with a non-negative
  *    dividend so floor and truncate agree on every engine;
  *  - the update is `w_j += Σ_docs (y·S − p)·x_j  div  (n·etaDen)` —
  *    the LMS / Widrow-Hoff gradient step with rational learning rate
  *    `1/etaDen`, truncate-toward-zero division (Spark `div`, DuckDB
  *    `//`, JVM `/` — verified identical on negatives).
  * Any engine replays the training bit for bit; the q148 oracle
  * unrolls the iterations as integer CTE steps.
  *
  * Scale design: feature extraction runs ONCE (tokenize → bucket →
  * per-doc count → per-doc array), is checkpointed, and its partition
  * budget follows the DOCUMENT COUNT (the [[Dedup.nearDupComponents]]
  * rule). Each training iteration is then map-side scoring (the
  * per-doc dot product folds the feats array against a broadcast
  * weight-map literal — `dim` is bounded by construction, so the
  * literal stays plan-sized) plus ONE partial-aggregating shuffle of
  * `dim`-sized gradient partials; the driver holds `dim` scalar
  * weights. Nothing doc-scale ever reaches the driver, no per-doc
  * state survives an iteration, and the per-iteration shuffle is
  * `O(dim)` rows regardless of corpus size — the 100 TB shape.
  *
  * Reference scope: the reference pipeline (`run.py`, `df_manager.py`)
  * ships no learned filter; this extends its curation surface the way
  * q124's heuristic funnel does, per the published corpus recipes
  * above.
  */
object QualityClassifier {

  /** Fixed-point scale: 1e6 units = 1.0 of weight / probability. */
  val Scale: Long = 1000000L

  /** Hash bucket of one token: first 6 hex digits of md5, mod `dim`.
    * 24 bits of hash keep the parse in exact integer range on every
    * engine; collisions are the textbook hashing-trick trade and fold
    * colliding tokens into one feature on BOTH engines identically.
    */
  def featureBucket(tok: Column, dim: Int): Column =
    conv(substring(md5(tok), 1, 6), 16, 10).cast("long") % dim

  /** Default training label: 1 iff the doc's distinct-token ratio is ≥
    * 1/2 (`2·|distinct| ≥ |tokens|`) — an integer-exact repetition
    * gate (the Gopher-style rep signal) available to any engine.
    */
  def distinctRatioLabel(tk: Column): Column =
    when(size(array_distinct(tk)) * 2 >= size(tk), lit(1L)).otherwise(lit(0L))

  /** Per-doc hashed features: `(id, y, feats: array<(j, x)>)` for
    * every doc with ≥ 1 token. Two aggregations, both doc-keyed —
    * runs once per training, never per iteration.
    */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     dim: Int,
                     labelFromTokens: Column => Column): DataFrame =
    docs
      .select(col(idCol).cast("string").as("id"),
        TextFunctions.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) > 0)
      .select(col("id"), labelFromTokens(col("__tk")).cast("long").as("y"),
        explode(col("__tk")).as("__tok"))
      .select(col("id"), col("y"),
        featureBucket(col("__tok"), dim).cast("int").as("j"))
      .groupBy(col("id"), col("y"), col("j"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("id"), col("y"))
      .agg(collect_list(struct(col("j"), col("x"))).as("feats"))

  /** Map-side fixed-point score of one doc: `z = Σ_j x_j · w_j` in
    * units, folding the feats array against a weight-map literal.
    * Unseen buckets score 0 via the coalesce (the map literal carries
    * every j in [0, dim), so this only guards dim mismatch).
    */
  private def zUnits(wmap: Column): Column =
    aggregate(col("feats"), lit(0L),
      (acc, f) => acc +
        f.getField("x") * coalesce(element_at(wmap, f.getField("j")), lit(0L)))

  /** Hard-sigmoid probability in units from the clamped-z column
    * `__zc` (clamp to ±2S upstream): `(2S + __zc) div 4` — dividend in
    * [0, 4S], so the floor division is engine-agnostic.
    */
  private def pUnitsExpr: Column =
    expr(s"(${2 * Scale} + __zc) div 4")

  /** Train `iterations` full-batch steps; returns the weight vector as
    * `(feat, w_units, w_r)` — one row per hash bucket, `feat` dense in
    * [0, dim) so the output shape is data-independent.
    *
    * `etaDen` is the inverse learning rate (η = 1/etaDen). The
    * feature frame is checkpointed before the loop; pass `reuse` to
    * train on a pre-built [[hashedFeatures]] frame instead (the spec's
    * planted-strata path).
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
            dim: Int = 64, iterations: Int = 3, etaDen: Long = 64L,
            labelFromTokens: Column => Column = distinctRatioLabel)
      : DataFrame = {
    require(dim >= 2 && dim <= 65536,
      s"dim must be in [2, 65536] (the weight map is a plan literal), got $dim")
    require(iterations >= 1, s"need iterations >= 1, got $iterations")
    require(etaDen >= 1L, s"need etaDen >= 1, got $etaDen")
    val spark = docs.sparkSession

    // features once, persisted; partition budget follows doc count
    // (a 500-doc fixture otherwise spreads over the full shuffle width
    // and every iteration schedules width-many near-empty tasks).
    // persist — NOT localCheckpoint — because the loop reuses the SAME
    // frame each round (no lineage growth to cut), and unlike
    // checkpoint blocks a persist can be dropped eagerly below: the
    // returned weight table is built from driver-held longs, so it
    // references nothing here
    val f0 = hashedFeatures(docs, idCol, textCol, dim, labelFromTokens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = f0.count()
    require(n > 0, "no documents with tokens to train on")
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, n / 65536L + 1L)).toInt
    val base =
      if (f0.rdd.getNumPartitions > parts) f0.coalesce(parts) else f0

    var w = Array.fill(dim)(0L)
    val den = n * etaDen
    for (_ <- 1 to iterations) {
      val wmap = typedlit(w.indices.map(j => j -> w(j)).toMap)
      val g = base
        .withColumn("__zc",
          greatest(lit(-2L * Scale), least(lit(2L * Scale), zUnits(wmap))))
        .withColumn("__e", lit(Scale) * col("y") - pUnitsExpr)
        .select(col("__e"), explode(col("feats")).as("f"))
        .groupBy(col("f.j").as("j"))
        .agg(sum(col("__e") * col("f.x")).as("g"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // JVM long division truncates toward zero — the shared contract
      w = Array.tabulate(dim)(j => w(j) + g.getOrElse(j, 0L) / den)
    }
    // training is done and the weights live on the driver: release the
    // feature cache NOW instead of leaving it to the ContextCleaner — a
    // long-lived driver training many models would otherwise accumulate
    // doc-scale cached frames
    f0.unpersist(blocking = false)
    weightsTable(spark, w)
  }

  /** A trained weight vector as the `(feat, w_units, w_r)` table
    * [[train]] returns — driver-held longs, no cluster work.
    */
  def weightsTable(spark: org.apache.spark.sql.SparkSession,
                   w: Array[Long]): DataFrame = {
    import spark.implicits._
    w.toSeq.zipWithIndex.map { case (v, j) => (j.toLong, v) }
      .toDF("feat", "w_units")
      .withColumn("w_r",
        NumFunctions.roundNz(col("w_units").cast("double") / Scale, 6))
      .orderBy(col("feat"))
  }

  // trained weight vectors keyed by (application, corpus key, params):
  // driver-side longs (dim ≤ 64k entries), the train-once / score-many
  // lifecycle shared with Corpus.learnBpeCached / Quantize.fitPqCached.
  // Entries from dead applications drop lazily on the next train.
  private val trainedWeights =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  /** [[train]] memoized per (session application, `key`, params),
    * returning the weight vector ready for [[scoreWith]] /
    * [[scoreRowWise]]. The whole evaluation family of a model (score,
    * calibration, AUC, uncertainty sampling) shares ONE training run
    * per session instead of each query silently retraining the
    * identical classifier. Only the default label function is cached —
    * a custom `labelFromTokens` is a different model, train it
    * explicitly.
    */
  def trainCached(key: String, docs: DataFrame, idCol: String, textCol: String,
                  dim: Int = 64, iterations: Int = 3, etaDen: Long = 64L)
      : Array[Long] = {
    val app = docs.sparkSession.sparkContext.applicationId
    val full = s"$app|$key|$idCol|$textCol|$dim|$iterations|$etaDen"
    val hit = trainedWeights.get(full)
    if (hit != null) hit
    else {
      val it = trainedWeights.keySet.iterator()
      while (it.hasNext) { if (!it.next().startsWith(app + "|")) it.remove() }
      trainedWeights.computeIfAbsent(full, _ =>
        train(docs, idCol, textCol, dim, iterations, etaDen)
          .orderBy(col("feat")).collect().map(_.getLong(1)))
    }
  }

  /** Score docs with a trained weight vector: `(id, y, z_units,
    * p_units)` — the inference pass (map-side only; the spec's
    * strata-separation check reads this).
    */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
                weights: Array[Long],
                labelFromTokens: Column => Column = distinctRatioLabel)
      : DataFrame = {
    val dim = weights.length
    val wmap = typedlit(weights.indices.map(j => j -> weights(j)).toMap)
    hashedFeatures(docs, idCol, textCol, dim, labelFromTokens)
      .withColumn("__zc",
        greatest(lit(-2L * Scale), least(lit(2L * Scale), zUnits(wmap))))
      .select(col("id"), col("y"), col("__zc").as("z_units"),
        pUnitsExpr.as("p_units"))
  }

  /** [[scoreWith]] as a ROW-LOCAL projection: `z = Σ_tokens
    * w[bucket(token)]` folds the token array directly against the
    * weight-map literal — identical integer result (summing per token
    * ≡ summing `x_j·w_j` per bucket), but with NO aggregation in the
    * plan at all. This is the production inference shape: zero
    * exchanges at any corpus size, and because it is a pure
    * projection it drops into a Structured Streaming query unchanged
    * (the gate's streaming twin is spec-pinned against this batch
    * path).
    */
  def scoreRowWise(docs: DataFrame, idCol: String, textCol: String,
                   weights: Array[Long],
                   labelFromTokens: Column => Column = distinctRatioLabel)
      : DataFrame = {
    val dim = weights.length
    val wmap = typedlit(weights.indices.map(j => j -> weights(j)).toMap)
    docs
      .select(col(idCol).cast("string").as("id"),
        TextFunctions.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) > 0)
      .withColumn("__z", aggregate(col("__tk"), lit(0L), (acc, t) =>
        acc + coalesce(
          element_at(wmap, featureBucket(t, dim).cast("int")), lit(0L))))
      .withColumn("__zc",
        greatest(lit(-2L * Scale), least(lit(2L * Scale), col("__z"))))
      .select(col("id"), labelFromTokens(col("__tk")).cast("long").as("y"),
        col("__zc").as("z_units"), pUnitsExpr.as("p_units"))
  }
}
