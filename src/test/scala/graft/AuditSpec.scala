package graft

import org.apache.spark.sql.functions._
import graft.operators.Audit
import graft.operators.Audit._

/** [[graft.operators.Audit]] — declarative constraint audit: exact
  * violation counts on crafted dirty data, the one-scan plan shape for
  * row-local checks, and empty-table safety.
  */
class AuditSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def dirty = Seq(
    (1L, Some(10.0), Some("a")),
    (2L, Some(500.0), None),          // range violation + null name
    (2L, Some(20.0), Some("b")),      // duplicate key
    (3L, None, Some("c")),            // null value: NOT a range violation
    (9L, Some(-5.0), Some("d"))       // range violation; orphan key
  ).toDF("id", "v", "name")

  private def parent = Seq(1L, 2L, 3L).toDF("pid")

  test("audit: exact violation counts per constraint class") {
    val got = Audit.audit(dirty, "t", Seq(
        NotNull("name"), NotNull("v"), InRange("v", 0.0, 100.0),
        UniqueKey(Seq("id")), ForeignKey("id", parent, "pid", "p")))
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got("not_null(name)") === ((5L, 1L, 0.2)))
    assert(got("not_null(v)") === ((5L, 1L, 0.2)))
    assert(got("in_range(v,0.0,100.0)") === ((5L, 2L, 0.4)))
    assert(got("unique(id)") === ((5L, 1L, 0.2)))
    assert(got("fk(id->p.pid)") === ((5L, 1L, 0.2)))
  }

  test("audit: all row-local constraints fold into one scan of the table") {
    val df = dirty
    val plan = Audit.audit(df, "t", Seq(
        NotNull("name"), NotNull("v"), InRange("v", 0.0, 100.0)))
      .queryExecution.optimizedPlan.toString
    val scans = "LocalRelation|LogicalRDD".r.findAllIn(plan).length
    assert(scans <= 2,
      s"3 row-local checks must share one aggregate pass (plus union of its result):\n$plan")
  }

  test("audit: clean table reports zero violations everywhere") {
    val clean = Seq((1L, Some(1.0), Some("x")), (2L, Some(2.0), Some("y")))
      .toDF("id", "v", "name")
    val got = Audit.audit(clean, "t", Seq(
        NotNull("name"), InRange("v", 0.0, 100.0), UniqueKey(Seq("id")),
        ForeignKey("id", parent, "pid", "p")))
      .select("n_violations", "violation_rate")
      .as[(Long, Double)].collect()
    assert(got.length === 4 && got.forall(_ == ((0L, 0.0))))
  }

  test("streams compose: per-micro-batch constraint audit gates each load (foreachBatch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, Double)]
    val q = input.toDS().toDF("id", "v")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // the deployment shape: every incoming load audited before the
        // sink sees it; total violations decide accept/quarantine
        val viol = Audit.audit(batch, "load", Seq(
            InRange("v", 0.0, 100.0), UniqueKey(Seq("id"))))
          .agg(sum(col("n_violations"))).collect().head.getLong(0)
        seen.synchronized { seen += ((id, viol)) }
        ()
      }.start()
    try {
      input.addData((1L, 5.0), (2L, 50.0))             // clean
      q.processAllAvailable()
      input.addData((3L, 500.0), (4L, 1.0), (4L, 2.0)) // range + dup key
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = seen.toMap
    assert(byBatch(0L) === 0L, s"clean batch flagged: $byBatch")
    assert(byBatch(1L) === 2L, s"dirty batch must show 2 violations: $byBatch")
  }

  test("audit: empty table yields zero rates, no division error") {
    val empty = Seq.empty[(Long, Option[Double], Option[String])]
      .toDF("id", "v", "name")
    val got = Audit.audit(empty, "t", Seq(
        NotNull("v"), UniqueKey(Seq("id"))))
      .select("n_rows", "n_violations", "violation_rate")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((0L, 0L, 0.0)))
  }
}
