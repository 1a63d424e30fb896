package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** [[graft.operators.QualityClassifier]] — fixed-point hashed-BoW
  * linear quality classifier. The training loop is pinned against a
  * plain-Scala integer replay (the determinism contract: any engine
  * reproduces the weights bit for bit), and the trained model must
  * SEPARATE planted quality strata — every clean doc scores above
  * every degenerate one.
  */
class QualityClassifierSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  // planted strata: "low" docs are one token repeated (distinct ratio
  // → 0, label 0); "high" docs are all-distinct token runs (ratio 1,
  // label 1). Tokens are disjoint across strata so the hashed features
  // carry signal (collisions under dim=64 may merge a few — the model
  // must still separate the strata, not each token).
  private def planted(nPerClass: Int): Seq[(Long, String)] = {
    val low = (0 until nPerClass).map { i =>
      (i.toLong, Seq.fill(20)(s"junk$i").mkString(" "))
    }
    val high = (0 until nPerClass).map { i =>
      ((nPerClass + i).toLong,
        (0 until 20).map(j => s"word${i}_$j").mkString(" "))
    }
    low ++ high
  }

  test("train separates planted quality strata (clean > degenerate, every pair)") {
    val docs = planted(12).toDF("doc_id", "text")
    val w = QualityClassifier.train(docs, "doc_id", "text",
        dim = 64, iterations = 3, etaDen = 64L)
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))
    assert(w.length === 64)
    assert(w.exists(_ != 0L), "training left every weight at zero")

    val scored = QualityClassifier.scoreWith(docs, "doc_id", "text", w)
      .collect().map(r => (r.getString(0).toLong, r.getLong(1), r.getLong(3)))
    val (lowZ, highZ) = scored.partition(_._1 < 12)
    assert(lowZ.length === 12 && highZ.length === 12)
    // full separation: min clean z strictly above max degenerate z
    assert(highZ.map(_._2).min > lowZ.map(_._2).max,
      s"strata overlap: high-min=${highZ.map(_._2).min} low-max=${lowZ.map(_._2).max}")
    // and the hard-sigmoid probabilities order the same way
    assert(highZ.map(_._3).min >= lowZ.map(_._3).max)
  }

  test("training replays bit-for-bit in plain integer Scala") {
    val docs = planted(4).toDF("doc_id", "text")
    val dim = 16; val iters = 3; val etaDen = 8L
    val got = QualityClassifier.train(docs, "doc_id", "text",
        dim = dim, iterations = iters, etaDen = etaDen)
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))

    // independent replay: same md5-prefix bucket, same hard sigmoid,
    // same truncating updates — no Spark involved
    val S = QualityClassifier.Scale
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.substring(0, 6), 16) % dim).toInt
    }
    val feats = planted(4).map { case (_, text) =>
      val tk = text.trim.split("\\s+").filter(_.nonEmpty)
      val y = if (2 * tk.distinct.length >= tk.length) 1L else 0L
      (y, tk.groupBy(bucket).view.mapValues(_.length.toLong).toMap)
    }
    val n = feats.length.toLong
    var w = Array.fill(dim)(0L)
    for (_ <- 1 to iters) {
      val g = Array.fill(dim)(0L)
      feats.foreach { case (y, xs) =>
        val z = xs.map { case (j, x) => x * w(j) }.sum
        val zc = math.max(-2 * S, math.min(2 * S, z))
        val p = (2 * S + zc) / 4
        val e = y * S - p
        xs.foreach { case (j, x) => g(j) += e * x }
      }
      w = Array.tabulate(dim)(j => w(j) + g(j) / (n * etaDen))
    }
    assert(got.toSeq === w.toSeq)
  }

  test("trainCached memoizes per (key, params): same array, no retrain; params change misses") {
    val docs = planted(8).toDF("doc_id", "text")
    val w1 = QualityClassifier.trainCached("qcspec", docs, "doc_id", "text",
      dim = 64, iterations = 2)
    // identical key → the SAME driver array back, no second training run
    assert(QualityClassifier.trainCached("qcspec", docs, "doc_id", "text",
      dim = 64, iterations = 2) eq w1)
    // different iterations = a different model
    val w2 = QualityClassifier.trainCached("qcspec", docs, "doc_id", "text",
      dim = 64, iterations = 3)
    assert(!(w2 eq w1))
    // the cached vector equals a fresh uncached train bit-for-bit
    val fresh = QualityClassifier.train(docs, "doc_id", "text",
        dim = 64, iterations = 2)
      .orderBy("feat").select("w_units").as[Long].collect()
    assert(w1.toSeq === fresh.toSeq)
  }

  test("docs with no tokens are excluded; empty corpus rejected") {
    val docs = Seq((0L, "   "), (1L, "a b c")).toDF("doc_id", "text")
    val f = QualityClassifier.hashedFeatures(docs, "doc_id", "text",
      dim = 8, QualityClassifier.distinctRatioLabel)
    assert(f.select(col("id")).as[String].collect().toSeq === Seq("1"))
    val empty = Seq((0L, " ")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      QualityClassifier.train(empty, "doc_id", "text", dim = 8)
    }
  }

  test("parameter guards: dim and etaDen bounds") {
    val docs = Seq((0L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      QualityClassifier.train(docs, "doc_id", "text", dim = 1)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(docs, "doc_id", "text", dim = 8, etaDen = 0L)
    }
  }

  test("scoreRowWise equals scoreWith row-for-row (per-token fold = per-bucket fold)") {
    val docs = planted(8).toDF("doc_id", "text")
    val w = QualityClassifier.train(docs, "doc_id", "text",
        dim = 32, iterations = 2, etaDen = 32L)
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows(QualityClassifier.scoreRowWise(docs, "doc_id", "text", w)) ===
      rows(QualityClassifier.scoreWith(docs, "doc_id", "text", w)))
    // the row-wise plan is a pure projection: no exchange anywhere
    val plan = QualityClassifier.scoreRowWise(docs, "doc_id", "text", w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"row-wise scoring must not shuffle:\n$plan")
  }
}
