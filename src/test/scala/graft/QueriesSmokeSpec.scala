package graft

/** t1 smoke (SURVEY §5.2): every declared query runs on sf0.001 and
  * produces rows; every oracle key refers to a declared query.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without a query: $extra")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 with rows > 0") {
      assert(fn(spark, sf0001).count() > 0, s"$name returned no rows")
    }
  }
}
