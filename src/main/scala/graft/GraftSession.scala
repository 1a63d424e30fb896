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
    // AQE skew-join splitting is the first line of defense against hot
    // keys (Joins.saltedJoin is the deterministic plan-time second);
    // explicit because a cluster-side conf override would silently
    // change join behavior at scale
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // runtime bloom-filter semi-join pruning: a selective dimension
    // filter is pushed into the fact scan as a bloom probe, cutting
    // shuffle input before the join — a 100 TB lever with no code
    // changes; on by default since 3.5, pinned for the same reason
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark
  }

  /** Small-file scan tuning for the local fixture corpus: the fixtures
    * are single parquet files (0.3–10 MB), so the 128 MB default split
    * gives every scan exactly one task. 4 MB splits spread row groups
    * across cores. Production-scale data should keep splits near the
    * default — this is a harness knob, which is why it is not part of
    * [[configure]].
    */
  def tuneForSmallFiles(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    // NOTE (round 19): a global small advisoryPartitionSizeInBytes was
    // measured and REJECTED twice (1 MB, interleaved A/B): it lifted a
    // few scan-bound text queries but regressed others unpredictably
    // (q106 1.34->2.70 s, q240 3.0->4.3 s in the two trials);
    // per-operator spreading is the targeted fix instead.
    spark
  }

  /** Root directory for the engine's memoized materialized copies —
    * prepared near-dup indexes ([[graft.operators.Dedup
    * .prepareNearDupIndexStored]]) and the [[graft.sinks.Layout]]
    * z-order / bucketed / Hive-partitioned copies: the
    * `spark.graft.scratchDir` conf when set, else the JVM tmpdir. At
    * cluster scale the default is WRONG — a driver-local tmpdir is
    * invisible to executors reading back the copy — so production
    * sessions must point the conf at a shared filesystem root
    * (`hdfs://…`, `s3a://…`); the tmpdir default keeps local/test
    * behavior unchanged. Joined via hadoop [[org.apache.hadoop.fs
    * .Path]] so scheme-qualified roots survive (the [[graft.sinks
    * .QuantileSink]] discipline).
    */
  def scratchRoot(spark: SparkSession): String =
    spark.conf.get("spark.graft.scratchDir",
      System.getProperty("java.io.tmpdir"))

  def scratchPath(spark: SparkSession, name: String): String =
    new org.apache.hadoop.fs.Path(scratchRoot(spark), name).toString

  /** Local session for tests / ad-hoc runs. `cores` should track the
    * machine; shuffle partitions are sized to cores, not the 200 default
    * (local mode has no cluster to fan out to).
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    tuneForSmallFiles(configure(
      SparkSession
        .builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    ))
}
