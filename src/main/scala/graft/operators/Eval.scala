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
    val cells = df
      .groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
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
