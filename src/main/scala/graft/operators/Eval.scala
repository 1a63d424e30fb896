package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.NumFunctions

/** Classifier evaluation over a (label, prediction) table — the report
  * a pipeline reads before trusting a learned gate (q148's quality
  * classifier, q152's language ID): per-class support, prediction
  * count, true positives, precision, recall, F1. Classifier-agnostic —
  * any operator emitting `(label, pred)` rows plugs in.
  *
  * Scale design: rows collapse ONCE to confusion cells (one
  * partial-aggregating shuffle, ≤ K² rows for K classes); support,
  * prediction counts, and the diagonal all derive from the cell table
  * (metadata-scale aggregates + class-keyed joins AQE broadcasts).
  * Ratios are single IEEE divisions of exact counts, rounded at the
  * edge — replayable on any engine.
  */
object Eval {

  /** Per-class classification report:
    * `(class, support, predicted, tp, precision, recall, f1)`,
    * covering every class appearing as a label OR a prediction.
    * Precision/recall are 0 when their denominator is 0; F1 is 0 when
    * precision + recall is 0 (the sklearn zero-division=0 convention).
    */
  def classificationReport(df: DataFrame, labelCol: String,
                           predCol: String): DataFrame = {
    // cells feed THREE aggregations (support, predicted, diagonal) —
    // persist them or the full upstream prediction plan recomputes per
    // branch (measured 2.4× on q161). K²-bounded state; lazy-scoped
    // lifecycle (the result references the cache; ContextCleaner
    // reclaims it with the result).
    val cells = df
      .groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sup = cells.groupBy(col("label").as("class"))
      .agg(sum(col("n")).as("support"))
    val prd = cells.groupBy(col("pred").as("class"))
      .agg(sum(col("n")).as("predicted"))
    val tp = cells.filter(col("label") === col("pred"))
      .select(col("label").as("class"), col("n").as("tp"))
    val p = when(col("predicted") > 0,
      col("tp").cast("double") / col("predicted")).otherwise(lit(0.0))
    val r = when(col("support") > 0,
      col("tp").cast("double") / col("support")).otherwise(lit(0.0))
    sup.join(prd, Seq("class"), "full")
      .join(tp, Seq("class"), "left")
      .select(col("class"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("predicted"), lit(0L)).as("predicted"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision", NumFunctions.roundNz(p, 6))
      .withColumn("recall", NumFunctions.roundNz(r, 6))
      .withColumn("f1", NumFunctions.roundNz(
        when(p + r > 0, lit(2.0) * p * r / (p + r)).otherwise(lit(0.0)), 6))
  }

  /** Exact ROC-AUC (Mann-Whitney U form) and Brier score for a binary
    * classifier with FIXED-POINT probability units: one summary row
    * `(n_pos, n_neg, auc, brier)`. Tie handling is the exact midrank
    * convention, in INTEGERS: over distinct scores ascending,
    * `U·2 = Σ n_pos(s) · (2·cum_neg_below(s) + n_neg(s))`, so equal
    * scores contribute half a concordant pair each — no float rank, no
    * tie-break arbitrariness; AUC = U2 / (2·n_pos·n_neg) is a single
    * IEEE division (null when either class is absent). The Brier sum
    * folds over the same collapsed table
    * (`n_pos·(p−1)² + n_neg·p²` per distinct score) through
    * DECIMAL(28,9).
    *
    * Scale design: rows collapse ONCE to per-distinct-score counts
    * (one partial-aggregating shuffle); the cumulative window then
    * runs over a support BOUNDED BY CONSTRUCTION at `scaleUnits + 1`
    * distinct values — independent of the row count — which is why a
    * partition-less window is safe here (the documented bounded-window
    * convention; fixed-point scores exist precisely to bound this).
    * U2 products ride in DECIMAL(38,0), exact far beyond any long
    * overflow (2n² at n = 10¹¹ rows ≈ 2·10²² ≪ 10³⁸).
    */
  def binaryScoreEval(df: DataFrame, pUnitsCol: String, labelCol: String,
                      scaleUnits: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val y = col(labelCol).cast("long")
    val s = df.groupBy(col(pUnitsCol).as("__p"))
      .agg(sum(y).as("__np"), sum(lit(1L) - y).as("__nn"))
    val w = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pd = col("__p").cast("double") / scaleUnits.toDouble
    val t = s
      .withColumn("__cumn", sum(col("__nn")).over(w) - col("__nn"))
      .withColumn("__u2", col("__np").cast(DecimalType(38, 0)) *
        (lit(2L) * col("__cumn") + col("__nn")).cast(DecimalType(38, 0)))
      .withColumn("__bt",
        ((pd - lit(1.0)) * (pd - lit(1.0)) * col("__np") + pd * pd * col("__nn"))
          .cast(DecimalType(28, 9)))
    t.agg(sum(col("__np")).as("n_pos"), sum(col("__nn")).as("n_neg"),
        sum(col("__u2")).as("__u2s"), sum(col("__bt")).as("__bs"))
      .select(
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"),
        NumFunctions.roundNz(
          when(col("n_pos") > 0 && col("n_neg") > 0,
            col("__u2s").cast("double") /
              (lit(2.0) * col("n_pos") * col("n_neg")))
            .otherwise(lit(null)), 6).as("auc"),
        NumFunctions.roundNz(
          when(col("n_pos") + col("n_neg") > 0,
            col("__bs").cast("double") / (col("n_pos") + col("n_neg")))
            .otherwise(lit(null)), 6).as("brier"))
  }

  /** Uncertainty sampling (Lewis & Gale, SIGIR 1994): the `k` documents
    * whose predicted probability sits closest to the decision boundary
    * — the rows a labeling budget should be spent on (active learning's
    * classic query strategy; the companion pass after training q148's
    * filter). Margin is computed in exact fixed-point units
    * (`|p − scale/2|`), so the cut is a pure integer total order with
    * an id tie-break. Returns `(idCol, p_units, margin_units)` in
    * ascending-margin order.
    *
    * Scale shape: map-side margin projection + a global TakeOrdered
    * k-row cut (per-partition heaps, no global sort materialization).
    */
  def uncertaintyTopK(df: DataFrame, idCol: String, pUnitsCol: String,
                      k: Int, scaleUnits: Long = 1000000L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(scaleUnits % 2 == 0, s"scaleUnits must be even, got $scaleUnits")
    df.select(col(idCol), col(pUnitsCol).as("p_units"),
        abs(col(pUnitsCol) - lit(scaleUnits / 2)).as("margin_units"))
      .orderBy(col("margin_units").asc, col(idCol).asc)
      .limit(k)
  }

  /** Calibration (reliability) table for a probabilistic classifier
    * whose scores are FIXED-POINT units (`scaleUnits` = probability
    * 1.0, the [[QualityClassifier.Scale]] convention): equal-width
    * probability buckets, and per bucket the document count, mean
    * predicted probability, and observed positive rate — a
    * well-calibrated model has mean_p ≈ pos_rate per bucket (the
    * reliability-diagram table; Niculescu-Mizil & Caruana 2005). The
    * bucket cut is INTEGER division of exact units, so bucketing can
    * never disagree across engines at a boundary.
    *
    * Scale shape: one map-side bucket projection + one
    * partial-aggregating shuffle over ≤ `buckets` groups.
    */
  def calibrationBuckets(df: DataFrame, pUnitsCol: String, labelCol: String,
                         buckets: Int = 10,
                         scaleUnits: Long = 1000000L): DataFrame = {
    require(buckets > 0 && scaleUnits % buckets == 0,
      s"buckets must divide scaleUnits evenly, got $buckets / $scaleUnits")
    val width = scaleUnits / buckets
    df
      .withColumn("bucket",
        least(lit(buckets - 1L), expr(s"$pUnitsCol div $width")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(pUnitsCol)).as("__sp"),
        sum(col(labelCol).cast("long")).as("__sy"))
      .select(col("bucket"), col("n_docs"),
        NumFunctions.roundNz(
          col("__sp").cast("double") / col("n_docs") / scaleUnits.toDouble, 6)
          .as("mean_p"),
        NumFunctions.roundNz(
          col("__sy").cast("double") / col("n_docs"), 6).as("pos_rate"))
  }
}
