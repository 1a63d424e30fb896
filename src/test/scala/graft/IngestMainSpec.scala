package graft

import graft.streaming.IngestMain

/** O25 — CLI argument/config validation error paths (the reference
  * validates its CLI + AWS env up front, `run.py:224-248`; the engine
  * must fail fast with a message naming the missing/bad argument, not
  * crash later inside a stream).
  */
class IngestMainSpec extends SparkSpec {

  test("parseArgs: key=value pairs parse; values may contain '='") {
    val conf = IngestMain.parseArgs(Array(
      "root=s3a://bucket/lake", "interval=10 seconds", "extra=a=b"))
    assert(conf("root") === "s3a://bucket/lake")
    assert(conf("interval") === "10 seconds")
    assert(conf("extra") === "a=b") // split limit 2: first '=' only
  }

  test("parseArgs: a bare token without '=' fails fast, naming the token") {
    val e = intercept[IllegalArgumentException](
      IngestMain.parseArgs(Array("root=x", "definitely-not-a-pair")))
    assert(e.getMessage.contains("definitely-not-a-pair"))
  }

  test("startQueries: missing root= fails fast") {
    val e = intercept[IllegalArgumentException](
      IngestMain.startQueries(spark, Map("checkpoint" -> "/tmp/ckpt")))
    assert(e.getMessage.contains("root"))
  }

  test("startQueries: missing checkpoint= fails fast") {
    val e = intercept[IllegalArgumentException](
      IngestMain.startQueries(spark, Map("root" -> "/tmp/lake")))
    assert(e.getMessage.contains("checkpoint"))
  }

  test("source: unknown source= is rejected with the offending value") {
    val e = intercept[IllegalArgumentException](
      IngestMain.source(spark, Map("source" -> "carrier-pigeon")))
    assert(e.getMessage.contains("carrier-pigeon"))
  }

  test("storage validation: s3a without any credential source fails fast (run.py:224-248 intent)") {
    // this container has no AWS env and no fs.s3a conf -> must refuse
    val e = intercept[IllegalArgumentException](IngestMain.validateStorageConf(spark,
      Map("root" -> "s3a://bucket/lake", "checkpoint" -> "s3a://bucket/ckpt")))
    assert(e.getMessage.contains("credential"))
    // instance-profile escape hatch
    IngestMain.validateStorageConf(spark, Map(
      "root" -> "s3a://bucket/lake", "skipStorageValidation" -> "true"))
    // local paths never need credentials
    IngestMain.validateStorageConf(spark, Map("root" -> "/tmp/lake"))
    // an explicit provider satisfies the check
    val h = spark.sparkContext.hadoopConfiguration
    h.set("fs.s3a.aws.credentials.provider", "com.example.Provider")
    try IngestMain.validateStorageConf(spark, Map("root" -> "s3a://bucket/lake"))
    finally h.unset("fs.s3a.aws.credentials.provider")
  }
}
