package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the fixture tables (`TESTDATA.md`): one parquet per table
  * under `/root/testdata/sf&#42;`. All loaders return the canonical engine
  * schema; the only non-trivial normalization is `events.ts`
  * (parquet TIMESTAMP(NANOS) → µs `TimestampType`, see [[GraftSession]]).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.configure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** Canonicalize `ts` to µs `TimestampType` whatever the fixture wrote:
    *  - parquet TIMESTAMP(NANOS) arrives as epoch-nanos Long
    *    (nanosAsLong); `x div 1000` floor-divides to micros — correct for
    *    the (all-positive) fixture epochs and identical to DuckDB's
    *    TIMESTAMP_NS → TIMESTAMP cast;
    *  - parquet µs with isAdjustedToUTC=false arrives as TIMESTAMP_NTZ
    *    (Spark 4 infers NTZ by default); the cast reads the wall-clock
    *    in the session zone — pinned to UTC by [[GraftSession]] — which
    *    is exactly DuckDB's treatment of its (naive) TIMESTAMP.
    */
  private def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // already µs TimestampType
    }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
