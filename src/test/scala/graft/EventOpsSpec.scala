package graft

import org.apache.spark.sql.functions._
import graft.ops.EventOps
import graft.schemas.TopicSchemas

/** Per-operator specs for the reference pipeline ops, including the
  * dirty-data corpus from FIXTURES.md §A.3 (every guard the reference
  * implements: missing timestamp, epoch-0, missing hit_counts, nan keys,
  * malformed JSON).
  */
class EventOpsSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private val visionMsgs = Seq(
    // clean, hit_counts present
    """{"timestamp": 1704067200000, "camera_id": "cam1", "locations": [{"x":1.0,"y":2.0,"label":"car"}], "hit_counts": 5}""",
    // hit_counts missing -> defaults to size(locations)=2  (O4, run.py:48-50)
    """{"timestamp": 1704067260000, "camera_id": "cam2", "locations": [{"x":1.0,"y":2.0,"label":"car"},{"x":3.0,"y":4.0,"label":"bus"}]}""",
    // timestamp missing -> dropped  (O9, df_manager.py:36-38)
    """{"camera_id": "cam3", "locations": []}""",
    // epoch-0 timestamp -> 1970, dropped  (O14, df_manager.py:67-68)
    """{"timestamp": 0, "camera_id": "cam4", "locations": []}""",
    // nan key -> dropped  (O18, df_manager.py:104-105)
    """{"timestamp": 1704067320000, "camera_id": "nan", "locations": []}""",
    // malformed JSON -> dropped (from_json null; poll-error analogue)
    """{not json at all""")

  private def visionBatch = visionMsgs.toDF("value")

  test("O3 decodeJson: malformed rows null out instead of crashing") {
    val decoded = EventOps.decodeJson(visionBatch, TopicSchemas.visionEvent)
    assert(decoded.count() === 6)
    assert(decoded.filter(col("record").isNull ||
      (col("record.timestamp").isNull && col("record.camera_id").isNull)).count() >= 1)
  }

  test("O4 patchHitCounts: missing hit_counts defaults to size(locations)") {
    val decoded = EventOps.decodeJson(visionBatch, TopicSchemas.visionEvent)
      .select(col("record.*"))
    val patched = EventOps.patchHitCounts(decoded)
    val byCam = patched.filter(col("camera_id").isin("cam1", "cam2"))
      .select("camera_id", "hit_counts").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(byCam === Map("cam1" -> 5, "cam2" -> 2))
  }

  test("O9/O14/O18 filterValid: dirty corpus drops exactly the guarded rows") {
    val decoded = EventOps.decodeJson(visionBatch, TopicSchemas.visionEvent)
      .select(col("record.*"))
    val timed = EventOps.deriveEventTime(decoded, "timestamp", "ts")
    val valid = EventOps.filterValid(timed, "ts", Some("camera_id"))
    assert(valid.select("camera_id").as[String].collect().sorted === Array("cam1", "cam2"))
  }

  test("O12 deriveEventTime: epoch-ms roundtrip") {
    val df = Seq(1704067200000L).toDF("timestamp")
    val out = EventOps.deriveEventTime(df, "timestamp", "ts")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as[String].head()
    assert(out === "2024-01-01 00:00:00")
  }

  test("O15 rangeFilter: half-open keeps day-1 and drops end boundary " +
       "(the reference's month-boundary bug, fixed)") {
    val df = Seq(
      "2024-01-01 00:00:00", // day 1: the reference drops this; we keep it
      "2024-01-15 12:00:00",
      "2024-02-01 00:00:00"  // end boundary: excluded
    ).toDF("s").select(col("s").cast("timestamp").as("ts"))
    val n = EventOps.rangeFilter(df, "ts", "2024-01-01 00:00:00", "2024-02-01 00:00:00").count()
    assert(n === 2)
  }

  test("O13 distinctMonths matches the set of months present") {
    val months = EventOps.distinctMonths(Tables.events(spark, sf0001))
      .as[String].collect().sorted
    assert(months.nonEmpty && months.forall(_.matches("\\d{4}-\\d{2}")))
  }

  test("O19 append: union accumulates without loss") {
    val e = Tables.events(spark, sf0001).select("event_id")
    val n = EventOps.append(e.limit(100), e.limit(50)).count()
    assert(n === 150)
  }

  test("forward compat: unknown EXTRA fields parse cleanly and are dropped " +
       "from the typed columns (deliberate policy; raw value is the escape hatch)") {
    // the reference tolerates mid-stream field additions (run.py:48-50);
    // our declared-schema policy: additive unknown fields neither corrupt
    // the parse nor leak columns — known fields decode, the addition is
    // dropped from the typed projection (and stays recoverable from the
    // raw `value`, which the AQ family persists as `props`)
    val msg = """{"timestamp": 1704067200000, "camera_id": "cam9", """ +
      """"locations": [], "hit_counts": 3, "firmware_rev": "v2.1", "speed": 42}"""
    val decoded = EventOps.decodeJson(Seq(msg).toDF("value"), TopicSchemas.visionEvent)
    val row = decoded.select(col("record.*")).collect().head
    assert(row.getAs[Long]("timestamp") === 1704067200000L)
    assert(row.getAs[String]("camera_id") === "cam9")
    assert(row.getAs[Int]("hit_counts") === 3)
    assert(!decoded.select("record.*").columns.contains("firmware_rev"))
  }
}
