package graft

import java.lang.Double.doubleToRawLongBits

import org.apache.spark.sql.functions._

import graft.functions.NumFunctions

/** Pins the negative-zero canonicalization every rounded-double oracle
  * column relies on: a tiny negative value must round to bit-exact
  * `+0.0` (raw bits 0L), never IEEE `-0.0` (raw bits Long.MinValue) —
  * the one-cell hash mismatch class found in q95's covariance matrix.
  */
class NumFunctionsSpec extends SparkSpec {

  private val posZeroBits = 0L

  test("roundNz: -1e-9 rounds to bit-exact +0.0 (engine path)") {
    val sp = spark
    import sp.implicits._
    val out = Seq(-1e-9, 1e-9, -0.0, 0.0, -0.5, 5.5)
      .toDF("v")
      .select(NumFunctions.roundNz(col("v"), 6).as("r"))
      .collect().map(_.getDouble(0))
    assert(doubleToRawLongBits(out(0)) == posZeroBits, "-1e-9 must emit +0.0")
    assert(doubleToRawLongBits(out(1)) == posZeroBits)
    assert(doubleToRawLongBits(out(2)) == posZeroBits, "-0.0 must normalize")
    assert(doubleToRawLongBits(out(3)) == posZeroBits)
    assert(out(4) == -0.5 && out(5) == 5.5, "non-zero values pass through")
  }

  test("roundNz: null stays null, NaN stays NaN") {
    val sp = spark
    import sp.implicits._
    val rows = Seq[Option[Double]](None, Some(Double.NaN))
      .toDF("v")
      .select(NumFunctions.roundNz(col("v"), 6).as("r"))
      .collect()
    assert(rows(0).isNullAt(0), "null must stay null")
    assert(rows(1).getDouble(0).isNaN, "NaN must stay NaN")
  }

  test("normNegZero (driver twin): -0.0 and BigDecimal-rounded near-zero → +0.0") {
    assert(doubleToRawLongBits(NumFunctions.normNegZero(-0.0)) == posZeroBits)
    val r = BigDecimal(-4.9e-7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(doubleToRawLongBits(NumFunctions.normNegZero(r)) == posZeroBits)
    assert(NumFunctions.normNegZero(-0.5) == -0.5)
  }

  test("Pca.covariance emits no negative zero at any cell") {
    val sp = spark
    import sp.implicits._
    // vectors engineered so several covariances are tiny and negative
    val vecs = Seq(
      Seq(1.0, -1e-7, 2.0), Seq(1.0, 1e-7, 2.0),
      Seq(-1.0, -1e-7, 2.0), Seq(-1.0, 1e-7, 2.0))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val cells = operators.Pca.covariance(df, "embedding", 3).collect()
    cells.foreach { r =>
      val c = r.getDouble(2)
      if (c == 0.0)
        assert(doubleToRawLongBits(c) == posZeroBits,
          s"cell (${r.getInt(0)},${r.getInt(1)}) emitted -0.0")
    }
  }
}
