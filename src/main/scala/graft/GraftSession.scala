package graft

import org.apache.spark.sql.SparkSession

/** Session configuration for the graft engine.
  *
  * Centralizes the runtime SQL confs every entry point (Verify, Bench,
  * tests, user apps) needs. Notably `spark.sql.legacy.parquet.nanosAsLong`:
  * the fixture `events` table stores `ts` as parquet TIMESTAMP(NANOS),
  * which Spark's TimestampType (microsecond) cannot represent natively —
  * we read it as an epoch-nanos Long and truncate to micros in
  * [[Tables.events]], matching DuckDB's ns→µs truncation.
  */
object GraftSession {

  /** Apply graft runtime confs to an existing session (idempotent). */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  /** Local session for tests / ad-hoc runs. `cores` should track the
    * machine; shuffle partitions are sized to cores, not the 200 default
    * (local mode has no cluster to fan out to).
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    configure(
      SparkSession
        .builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
}
