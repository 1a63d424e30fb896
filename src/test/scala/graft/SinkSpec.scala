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

  test("compactPartitions: many appended files collapse to one per leaf, rows intact (O19 parity)") {
    val dir = Files.createTempDirectory("graft_compact_").toString
    // five appends -> >= 5 files per touched partition (the accumulation
    // the reference avoids by rewriting whole objects on every flush)
    (0 until 5).foreach { i =>
      PartitionedSink.appendPartitioned(
        sample.withColumn("id", col("id") + lit(i * 10L)), dir)
    }
    def dataFiles(leaf: String) = new java.io.File(s"$dir/$leaf")
      .listFiles().count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(dataFiles("entity=camA/year=2024/month=1") >= 5)
    val before = spark.read.parquet(dir)
      .as[(Long, Int, String, Int, Int)].collect().toSet

    val n = PartitionedSink.compactPartitions(spark, dir)
    assert(n === 3, s"expected all 3 leaf partitions compacted, got $n")
    Seq("entity=camA/year=2024/month=1", "entity=camA/year=2024/month=2",
        "entity=camB/year=2024/month=1").foreach { leaf =>
      assert(dataFiles(leaf) === 1, s"$leaf not compacted to one file")
      assert(!new java.io.File(s"$dir/$leaf/_compact_tmp").exists())
      assert(!new java.io.File(s"$dir/$leaf/_compact_old").exists())
    }
    assert(spark.read.parquet(dir)
      .as[(Long, Int, String, Int, Int)].collect().toSet === before)

    // idempotent: already-compacted partitions are left alone
    assert(PartitionedSink.compactPartitions(spark, dir) === 0)
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
