package graft

import org.apache.spark.sql.functions._
import graft.plans.TopKViaHeapRule

/** Optimizer-rule spec: the window rank-filter rewrite produces the
  * heap plan and byte-identical results.
  */
class TopKRuleSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def windowTop3Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM ord) t WHERE rk <= 3
      |""".stripMargin

  test("rank-filter window rewrites to collect_top_k with identical results") {
    Tables.orders(spark, sf0001).createOrReplaceTempView("ord")

    val before = spark.sql(windowTop3Sql)
    val expected = before.as[(Long, Long, Double, Int)].collect().toSet
    assert(before.queryExecution.executedPlan.toString.contains("Window"),
      "sanity: un-rewritten plan should use a Window")

    TopKViaHeapRule.enable(spark)
    try {
      val after = spark.sql(windowTop3Sql)
      val p = after.queryExecution.executedPlan.toString
      assert(p.contains("partial_collect_top_k"), s"rule did not fire:\n$p")
      assert(!p.contains("WindowGroupLimit") && !p.contains("Sort "),
        s"sort-based pre-limit survived the rewrite:\n$p")
      assert(after.as[(Long, Long, Double, Int)].collect().toSet === expected)
    } finally disable()
  }

  test("rule leaves non-rank window queries untouched") {
    TopKViaHeapRule.enable(spark)
    try {
      // q33's lag/cumsum windows must not match the pattern
      val p = SparkEntry.q33(spark, sf0001).queryExecution.executedPlan.toString
      assert(p.contains("Window"), "sessionize windows should survive")
      assert(!p.contains("collect_top_k"), "rule misfired on a non-rank window")
    } finally disable()
  }

  test("rule bails on unsupported order combos (desc on strings)") {
    Tables.orders(spark, sf0001).createOrReplaceTempView("ord")
    TopKViaHeapRule.enable(spark)
    try {
      val p = spark.sql(
        """SELECT * FROM (SELECT o_orderkey, o_orderstatus,
          |  row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority DESC) AS rk
          |FROM ord) WHERE rk <= 2
          |""".stripMargin).queryExecution.executedPlan.toString
      assert(p.contains("Window"), "desc on a string column must keep the window plan")
    } finally disable()
  }

  test("rewrite is NaN-correct and overflow-safe on descending keys") {
    Seq((1, Double.NaN), (1, 5.0), (1, 3.0), (1, 9.0), (2, 1.0))
      .toDF("k", "v").createOrReplaceTempView("nan_t")
    Seq((1, Int.MinValue), (1, 5), (1, 3), (2, 7))
      .toDF("k", "v").createOrReplaceTempView("min_t")
    def top2(view: String) =
      s"""SELECT k, v, rk FROM (SELECT k, v,
         |  row_number() OVER (PARTITION BY k ORDER BY v DESC, v) AS rk FROM $view)
         |WHERE rk <= 2""".stripMargin
    val nanBefore = spark.sql(top2("nan_t")).collect().map(_.toString).sorted.toSeq
    val minBefore = spark.sql(top2("min_t")).collect().map(_.toString).sorted.toSeq
    TopKViaHeapRule.enable(spark)
    try {
      val pn = spark.sql(top2("nan_t"))
      assert(pn.queryExecution.executedPlan.toString.contains("collect_top_k"))
      // NaN ranks first under DESC (Spark orders NaN largest) — preserved
      assert(pn.collect().map(_.toString).sorted.toSeq === nanBefore)
      val pm = spark.sql(top2("min_t"))
      assert(pm.queryExecution.executedPlan.toString.contains("collect_top_k"))
      // Int.MinValue must not overflow (ANSI) nor jump to rank 1
      assert(pm.collect().map(_.toString).sorted.toSeq === minBefore)
    } finally disable()
  }

  test("rule bails when the payload is unorderable (map column)") {
    spark.sql("SELECT 1 AS k, 2 AS v, map('a', 1) AS m").createOrReplaceTempView("map_t")
    TopKViaHeapRule.enable(spark)
    try {
      val p = spark.sql(
        """SELECT * FROM (SELECT k, v, m,
          |  row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rk FROM map_t)
          |WHERE rk <= 1""".stripMargin)
      assert(!p.queryExecution.executedPlan.toString.contains("collect_top_k"),
        "must not heap-aggregate a map-typed payload")
      assert(p.count() === 1) // and the window plan still runs
    } finally disable()
  }

  test("mirror predicate form k > rk also rewrites") {
    Tables.orders(spark, sf0001).createOrReplaceTempView("ord")
    TopKViaHeapRule.enable(spark)
    try {
      val p = spark.sql(
        """SELECT * FROM (SELECT o_custkey, o_orderkey,
          |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rk FROM ord)
          |WHERE 4 > rk""".stripMargin)
      assert(p.queryExecution.executedPlan.toString.contains("collect_top_k"))
    } finally disable()
  }

  test("modePerKey: highest count wins, ties break toward the greatest value") {
    val df = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"),             // clear winner a (2 vs 1)
      (2L, "x"), (2L, "y"),                        // tie 1-1 → y (greatest)
      (3L, "z")
    ).toDF("k", "v")
    val got = graft.operators.TopK.modePerKey(df, Seq("k"), "v")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got === Seq((1L, "a", 2L), (2L, "y", 1L), (3L, "z", 1L)))
  }

  test("modePerKey plans two partial aggregates and no Window") {
    val df = Seq((1L, "a")).toDF("k", "v")
    val p = graft.operators.TopK.modePerKey(df, Seq("k"), "v")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"mode must not rank via a window:\n$p")
    assert(p.contains("partial_max") || p.contains("partial"),
      s"struct max must partial-aggregate:\n$p")
  }

  test("auto-rewrite is opt-in: rule registered but conf unset is a no-op") {
    Tables.orders(spark, sf0001).createOrReplaceTempView("ord")
    // the GraftExtensions path: rule present, nobody opted in — the
    // measured-slower heap plan must NOT replace the window silently
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.conf.unset(TopKViaHeapRule.enabledConf)
    if (!classic.experimental.extraOptimizations.contains(TopKViaHeapRule))
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ TopKViaHeapRule
    try {
      val p = spark.sql(windowTop3Sql).queryExecution.executedPlan.toString
      assert(p.contains("Window") && !p.contains("collect_top_k"),
        s"default-off rewrite fired without opt-in:\n$p")
    } finally disable()
  }

  private def disable(): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.conf.unset(TopKViaHeapRule.enabledConf)
    classic.experimental.extraOptimizations =
      classic.experimental.extraOptimizations.filterNot(_ == TopKViaHeapRule)
  }
}
