package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sinks.PartitionedSink

/** Sink-layer specs: the reference-compat CSV sink (O20) and the
  * small-file-guard repartitioner write the same table back.
  */
class SinkSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def sample = Seq(
    (1L, "camA", 2024, 1, 7), (2L, "camA", 2024, 2, 3), (3L, "camB", 2024, 1, 9))
    .toDF("id", "entity", "year", "month", "hits")

  test("csv compatibility sink: partitioned write + read-back (O20 parity)") {
    val dir = Files.createTempDirectory("graft_csv_").toString
    PartitionedSink.appendPartitioned(sample, dir, format = "csv")
    // Hive-style layout on disk, as the reference builds by hand
    assert(new java.io.File(s"$dir/entity=camA/year=2024/month=1").exists())
    val back = spark.read
      .schema("id LONG, hits INT, entity STRING, year INT, month INT")
      .csv(dir)
      .select("id", "entity", "year", "month", "hits")
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1)
    assert(back === sample.as[(Long, String, Int, Int, Int)].collect().sortBy(_._1))
  }

  test("repartitionByPartitionColumns yields one file per partition tuple") {
    val dir = Files.createTempDirectory("graft_onefile_").toString
    val big = sample.repartition(8) // many tasks -> would write many files
    PartitionedSink.appendPartitioned(
      PartitionedSink.repartitionByPartitionColumns(big), dir)
    val files = new java.io.File(s"$dir/entity=camA/year=2024/month=1")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files === 1, s"expected exactly one parquet file, got $files")
  }
}
