package graft

import org.apache.spark.sql.functions._
import graft.sinks.QuantileSink

/** [[graft.sinks.QuantileSink]] — the incremental materialized view for
  * DDSketch quantiles. Invariants: fold(batches) ≡ the one-shot
  * [[graft.operators.Sketches.ddQuantiles]] over the union (same
  * bucketing code, addition-merged state, so BIT-identical estimates),
  * untouched partitions are never rewritten, and the α relative-error
  * bound holds against the exact order statistic at every fold point.
  */
class QuantilesSinkSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def vals(rows: (String, Double)*) = rows.toDF("grp", "v")

  private def parquetFiles(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    walk(new java.io.File(dir)).map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  private def quantRows(root: String, qs: Seq[Int]) =
    QuantileSink.quantiles(spark, root, Seq("grp"), qs)
      .as[(String, Long, Long, Double)].collect().toSet

  test("fold of batches equals the one-shot ddQuantiles; only touched partitions rewritten") {
    val root = java.nio.file.Files.createTempDirectory("qsink").toString + "/sk"
    // ~3 decades of spread per group so bucketing actually matters
    def v(g: Int, i: Int): Double = math.exp((i * 7 + g) % 300 / 50.0) * 0.01
    val b1 = vals((1 to 400).map(i => (s"g${i % 3}", v(i % 3, i))): _*)
    val b2 = vals((1 to 200).map(i => (s"g${i % 2}", v(i % 2, i + 57))): _*)

    assert(QuantileSink.maintain(spark, b1, root, Seq("grp"), Seq("grp"), "v") === 3)
    val filesAfterB1 = parquetFiles(root)
    // b2 touches g0/g1 only
    assert(QuantileSink.maintain(spark, b2, root, Seq("grp"), Seq("grp"), "v") === 2)

    val qs = Seq(10, 50, 90, 99)
    val maintained = quantRows(root, qs)
    val recomputed = graft.operators.Sketches
      .ddQuantiles(b1.unionByName(b2), "grp", "v", qs)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(maintained === recomputed,
      "maintained sketch must equal the one-shot batch sketch bit-for-bit")

    // α bound against the exact order statistic, per maintained row
    val alpha = 0.02 / 2.02
    val exactByGroup = b1.unionByName(b2).as[(String, Double)].collect()
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted }
    maintained.foreach { case (g, q, n, est) =>
      val exact = exactByGroup(g)(((n * q + 99) / 100).toInt - 1)
      assert(math.abs(est - exact) <= alpha * exact + 1e-9,
        s"$g p$q: est $est vs exact $exact breaks the bound after folding")
    }

    // partition g2 untouched by b2: exactly the same files
    val filesAfterB2 = parquetFiles(root)
    assert(filesAfterB1.filter(_._1.contains("grp=g2")) ===
      filesAfterB2.filter(_._1.contains("grp=g2")),
      "untouched partition was rewritten")
    assert(filesAfterB1.keySet.filter(_.contains("grp=g0")) !==
      filesAfterB2.keySet.filter(_.contains("grp=g0")))
  }

  test("foreachBatch wiring: a stream maintains the standing quantile table") {
    val root = java.nio.file.Files.createTempDirectory("qsinks").toString + "/sk"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Double)]
    val q = input.toDF().toDF("grp", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          QuantileSink.maintain(spark, b, root, Seq("grp"), Seq("grp"), "v")
          ()
        }
      }.start()
    val data = (1 to 300).map(i => (s"s${i % 2}", math.exp((i % 80) / 16.0) * 0.3))
    input.addData(data.take(100)); q.processAllAvailable()
    input.addData(data.drop(100)); q.processAllAvailable()
    q.stop()
    val maintained = quantRows(root, Seq(25, 50, 75))
    val recomputed = graft.operators.Sketches
      .ddQuantiles(data.toDF("grp", "v"), "grp", "v", Seq(25, 50, 75))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(maintained === recomputed)
    assert(maintained.forall(_._3 === 150L))
  }
}
