package graft

import graft.operators.Snapshot

/** [[graft.operators.Snapshot]] — CDC-style snapshot reconciliation:
  * status classification, null-safe key and value comparison, and the
  * delta-only projection.
  */
class SnapshotSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def snap(rows: (Long, String, Double)*) =
    rows.toDF("id", "name", "price")

  test("diff: added / removed / changed / unchanged classification") {
    val old = snap((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
    val neu = snap((2L, "y", 20.0), (3L, "z", 31.0), (4L, "w", 40.0))
    val got = Snapshot.diff(old, neu, Seq("id"), Seq("name", "price"))
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("diff: old_/new_ columns carry both sides; absent side is null") {
    val old = snap((1L, "x", 10.0))
    val neu = snap((2L, "y", 20.0))
    val rows = Snapshot.diff(old, neu, Seq("id"), Seq("price"))
      .select("id", "old_price", "new_price", "status")
      .as[(Long, Option[Double], Option[Double], String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows(1L) === ((Some(10.0), None, "removed")))
    assert(rows(2L) === ((None, Some(20.0), "added")))
  }

  test("diff: value comparison is null-safe (null vs null is unchanged)") {
    val old = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("id", "price")
    val neu = Seq((1L, Option.empty[Double]), (2L, Option(5.0)))
      .toDF("id", "price")
    val got = Snapshot.diff(old, neu, Seq("id"), Seq("price"))
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("changes: drops unchanged rows only") {
    val old = snap((1L, "x", 10.0), (2L, "y", 20.0))
    val neu = snap((1L, "x", 10.0), (2L, "y", 99.0))
    val got = Snapshot.changes(old, neu, Seq("id"), Seq("name", "price"))
      .select("id", "status").as[(Long, String)].collect().toSeq
    assert(got === Seq((2L, "changed")))
  }

  test("diff: empty compareCols never reports changed") {
    val old = snap((1L, "x", 10.0))
    val neu = snap((1L, "CHANGED", 99.0))
    val got = Snapshot.diff(old, neu, Seq("id"), Nil)
      .select("status").as[String].collect().toSeq
    assert(got === Seq("unchanged"))
  }
}
