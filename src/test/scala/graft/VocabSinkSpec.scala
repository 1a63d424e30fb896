package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus
import graft.sinks.VocabSink

/** [[graft.sinks.VocabSink]] — the maintained vocabulary table. The
  * invariants: maintained ≡ recomputed (term counts and the derived
  * Good-Turing stats), exactly-once per batchId (re-apply is a no-op),
  * untouched (lang, bucket) partitions are never rewritten, and the
  * OOV probe reads only the standing table. The crash-point replay
  * protocol itself is [[graft.sinks.IncrementalAgg]]'s, proven in
  * IncrementalAggSpec; this spec proves the vocabulary composition
  * preserves it.
  */
class VocabSinkSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def parquetFiles(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    walk(new java.io.File(dir)).map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  test("maintained counts equal a recompute; re-applying a batchId is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("vocab1").toString + "/v"
    val b0 = Seq((1L, "en", "a a b"), (2L, "de", "x y")).toDF("doc_id", "lang", "text")
    val b1 = Seq((3L, "en", "b c"), (4L, "de", null: String)).toDF("doc_id", "lang", "text")
    assert(VocabSink.maintain(spark, b0, root, "lang", "text", 0L) > 0)
    assert(VocabSink.maintain(spark, b1, root, "lang", "text", 1L) > 0)
    val got = VocabSink.read(spark, root)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("en", "a") -> 2L, ("en", "b") -> 2L, ("en", "c") -> 1L,
      ("de", "x") -> 1L, ("de", "y") -> 1L))
    // exactly-once: the _APPLIED marker short-circuits the replay
    assert(VocabSink.maintain(spark, b0, root, "lang", "text", 0L) === 0)
    val again = VocabSink.read(spark, root)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(again === got)
  }

  test("goodTuring off the maintained table equals the corpus operator") {
    val root = java.nio.file.Files.createTempDirectory("vocab2").toString + "/v"
    val docs = Seq((1L, "en", "a a a b"), (2L, "en", "b c d"),
      (3L, "de", "x x"), (4L, "de", "q")).toDF("doc_id", "lang", "text")
    (0L to 1L).foreach { day =>
      VocabSink.maintain(spark, docs.filter(pmod(col("doc_id"), lit(2)) === day),
        root, "lang", "text", day)
    }
    val maintained = VocabSink.goodTuring(spark, root)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val recomputed = Corpus.goodTuringMass(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(maintained === recomputed)
  }

  test("a batch touching one language leaves the other language's partitions untouched") {
    val root = java.nio.file.Files.createTempDirectory("vocab3").toString + "/v"
    val b0 = Seq((1L, "en", "alpha beta"), (2L, "de", "gamma"))
      .toDF("doc_id", "lang", "text")
    VocabSink.maintain(spark, b0, root, "lang", "text", 0L)
    val before = parquetFiles(root).filter(_._1.contains("lang=de"))
    assert(before.nonEmpty)
    val b1 = Seq((3L, "en", "alpha delta")).toDF("doc_id", "lang", "text")
    VocabSink.maintain(spark, b1, root, "lang", "text", 1L)
    val after = parquetFiles(root).filter(_._1.contains("lang=de"))
    assert(after === before, "de partitions must be byte-identical (never rewritten)")
  }

  test("oovRate: hand-counted unseen tokens off the standing table only") {
    val root = java.nio.file.Files.createTempDirectory("vocab4").toString + "/v"
    val train = Seq((1L, "en", "x y"), (2L, "de", "z")).toDF("doc_id", "lang", "text")
    VocabSink.maintain(spark, train, root, "lang", "text", 0L)
    val probe = Seq((9L, "en", "x q q"), (10L, "fr", "w"))
      .toDF("doc_id", "lang", "text")
    val got = VocabSink.oovRate(spark, root, probe, "lang", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("en") === ((3L, 2L, BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got("fr") === ((1L, 1L, 1.0)), "unseen language is 100% OOV")
  }
}
