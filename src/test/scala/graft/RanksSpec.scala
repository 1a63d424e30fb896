package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranks

/** [[graft.operators.Ranks]] — the distributed rank/ntile must agree
  * bit-for-bit with Spark's own single-partition window functions (the
  * semantic spec), including ties, the uneven-bucket fill rule, and
  * n < k.
  */
class RanksSpec extends SparkSpec {

  private def users(n: Int) = {
    val s = spark
    import s.implicits._
    // duplicate values force tie-handling through the tiebreaker column
    (1 to n).map(i => (i.toLong, (i % 7).toDouble)).toDF("id", "v")
      .repartition(8)
  }

  test("globalRank matches a single-partition row_number over the same total order") {
    val df = users(1000)
    val order = Seq(col("v").desc, col("id").asc)
    val got = Ranks.globalRank(df, order, outCol = "rk")
      .select(col("id"), col("rk")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("rk", row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select(col("id"), col("rk")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("ntileExact matches ntile(k) for k in 1..8, n not divisible by k") {
    val df = users(1003)
    val order = Seq(col("v").desc, col("id").asc)
    for (k <- 1 to 8) {
      val got = Ranks.ntileExact(df, order, k, outCol = "b")
        .select(col("id"), col("b")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.withColumn("b", ntile(k).over(Window.orderBy(order: _*)).cast("long"))
        .select(col("id"), col("b")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"ntileExact diverged from ntile at k=$k")
    }
  }

  test("ntileExact with n < k: each row its own bucket, in rank order") {
    val df = users(3)
    val got = Ranks.ntileExact(df, Seq(col("v").desc, col("id").asc), k = 10, outCol = "b")
      .select(col("id"), col("b")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // order: v desc (2.0, 1.0, 0.0 → ids 2, 1, 3... v = i % 7) — check vs window
    val want = df.withColumn("b",
        ntile(10).over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
      .select(col("id"), col("b")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("empty input yields empty output, no failure") {
    val df = users(10).filter(col("id") < 0)
    assert(Ranks.ntileExact(df, Seq(col("id").asc), k = 4).count() === 0)
    assert(graft.operators.Corpus.shuffleOrder(
      df.select(col("id").as("doc_id")), "doc_id", "s").count() === 0)
  }

  test("single row: rank 1, bucket 1, any k") {
    val df = users(1)
    val r = Ranks.ntileExact(df, Seq(col("id").asc), k = 4, outCol = "b")
      .select("id", "b").collect()
    assert(r.length === 1 && r.head.getLong(1) === 1L)
  }

  test("rank values are a permutation of 1..n regardless of range-boundary placement") {
    val df = users(257)
    val rks = Ranks.globalRank(df, Seq(col("v").asc, col("id").desc), outCol = "rk",
        numPartitions = 5)
      .select(col("rk")).collect().map(_.getLong(0)).sorted
    assert(rks.toSeq === (1L to 257L))
  }

  private def keyed(n: Int, keys: Int) = {
    val s = spark
    import s.implicits._
    // FEW hot keys — exactly the regime where a keyed window serializes
    (1 to n).map(i => (s"k${i % keys}", i.toLong, (i % 13).toDouble))
      .toDF("k", "id", "v").repartition(8)
  }

  test("perKeyRank matches row_number() OVER (PARTITION BY key) on a 3-hot-key stream") {
    val df = keyed(1201, keys = 3)
    val order = Seq(col("v").desc, col("id").asc)
    val got = Ranks.perKeyRank(df, Seq("k"), order, outCol = "rk", numPartitions = 7)
      .select(col("k"), col("id"), col("rk")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = df.withColumn("rk", row_number().over(
        Window.partitionBy(col("k")).orderBy(order: _*)).cast("long"))
      .select(col("k"), col("id"), col("rk")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("perKeyRank: each key's ranks are a dense 1..n_k permutation under adversarial splits") {
    val df = keyed(509, keys = 2)
    val byKey = Ranks.perKeyRank(df, Seq("k"), Seq(col("id").asc), outCol = "rk",
        numPartitions = 11)
      .select(col("k"), col("rk")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    byKey.foreach { case (k, rks) =>
      assert(rks === (1L to rks.length.toLong), s"key $k ranks not dense: $rks")
    }
  }

  test("perKeyRank plans no single-task key window: data windows carry __part") {
    val df = keyed(503, keys = 2)
    val p = Ranks.perKeyRank(df, Seq("k"), Seq(col("id").asc), outCol = "rk")
      .queryExecution.executedPlan.toString
    val windows = "Window \\[[^\\n]*".r.findAllIn(p).toSeq
    // the data-scale window must partition by (k, __part); the only
    // window WITHOUT __part is the metadata cumsum over (key, part)
    // counts, identified by its __cnt input
    assert(windows.nonEmpty, s"expected windows in:\n$p")
    assert(windows.forall(w => w.contains("__part") || w.contains("__cnt")),
      s"found a per-key window not bounded by the range split:\n$p")
  }
}
