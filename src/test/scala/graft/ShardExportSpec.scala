package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

import graft.sinks.ShardExport

/** [[graft.sinks.ShardExport]] — the deterministic training-shard
  * export. The contract pins: conservation (every doc lands exactly
  * once), first-fit budget geometry (contiguous rank spans, no shard
  * except the last under-fills its boundary), manifest-last commit
  * (stored == recomputed-from-disk; a missing manifest fails fast and
  * a rewrite converges), replay idempotence, and salt-keyed
  * determinism.
  */
class ShardExportSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"shards-$tag").toString + "/root"

  // ~40 docs with token counts 1..10 — several shards at budget 25
  private lazy val corpus = (0L until 40L).map { i =>
    (i, ("tok " * (1 + (i % 10)).toInt).trim)
  }.toDF("doc_id", "text")

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.orderBy("shard").collect().toSeq

  test("round-trip: conservation, contiguous spans, budget geometry, stored == recomputed") {
    val root = freshRoot("rt")
    val m = ShardExport.write(spark, corpus, "doc_id", "text",
      budget = 25L, salt = "s1", root, bucketWidth = 8)
    val rows = sortedRows(m)
    assert(rows.nonEmpty && rows.size > 1) // budget forces multiple shards

    // conservation: counts and tokens sum to the corpus totals
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 40L)
    val totalToks = corpus
      .agg(sum(graft.functions.TextFunctions.tokenCount(col("text"))))
      .head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === totalToks)

    // shard ids consecutive from 0; rank spans contiguous and ordered
    assert(rows.map(_.getAs[Long]("shard")) === rows.indices.map(_.toLong))
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(a.getAs[Long]("rank_max") + 1 === b.getAs[Long]("rank_min"))
    }
    assert(rows.head.getAs[Long]("rank_min") === 1L)
    assert(rows.map(r => r.getAs[Long]("rank_max") - r.getAs[Long]("rank_min") + 1)
      .sum === 40L)

    // first-fit: every shard but the last reaches its boundary — its
    // tokens plus the NEXT shard's first doc would exceed the budget
    // multiple; equivalently each non-final shard holds ≥ budget
    // tokens' worth of boundary: prefix at its end ≥ (shard+1)*budget
    val prefixes = rows.scanLeft(0L)(_ + _.getAs[Long]("n_tokens")).drop(1)
    rows.init.zip(prefixes.init).foreach { case (r, prefixEnd) =>
      assert(prefixEnd >= (r.getAs[Long]("shard") + 1) * 25L)
    }
    // and no doc splits: a shard never exceeds budget by more than the
    // max single-doc token count (10 here)
    rows.foreach(r => assert(r.getAs[Long]("n_tokens") <= 25L + 10L))

    // stored manifest == manifest recomputed from the files on disk
    val recomputed = sortedRows(
      ShardExport.manifestFromData(spark, root, "doc_id", "text"))
    assert(rows === recomputed)

    // read-back docs are exactly the corpus
    val back = ShardExport.readBack(spark, root)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(back === corpus.as[(Long, String)].collect().toSet)
  }

  test("replay is idempotent; a crashed (manifest-less) export fails fast then rewrites") {
    val root = freshRoot("replay")
    val m1 = sortedRows(ShardExport.write(spark, corpus, "doc_id", "text",
      budget = 25L, salt = "s1", root, bucketWidth = 8))
    val m2 = sortedRows(ShardExport.write(spark, corpus, "doc_id", "text",
      budget = 25L, salt = "s1", root, bucketWidth = 8))
    assert(m1 === m2)

    // simulate a crash between data and manifest: manifest gone
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(ShardExport.manifestDir(root)), true)
    val ex = intercept[IllegalArgumentException] {
      ShardExport.manifest(spark, root)
    }
    assert(ex.getMessage.contains("no committed manifest"))
    // the next write overwrites the partial data and commits
    val m3 = sortedRows(ShardExport.write(spark, corpus, "doc_id", "text",
      budget = 25L, salt = "s1", root, bucketWidth = 8))
    assert(m3 === m1)
  }

  test("salt keys the shuffle: totals conserved, membership moves; null text folds to zero tokens") {
    val rootA = freshRoot("saltA")
    val rootB = freshRoot("saltB")
    val mA = ShardExport.write(spark, corpus, "doc_id", "text",
      budget = 25L, salt = "s1", rootA, bucketWidth = 8)
    val mB = ShardExport.write(spark, corpus, "doc_id", "text",
      budget = 25L, salt = "other", rootB, bucketWidth = 8)
    assert(mA.agg(sum("n_docs"), sum("n_tokens")).head() ===
      mB.agg(sum("n_docs"), sum("n_tokens")).head())
    val fpA = ShardExport.readBack(spark, rootA)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val fpB = ShardExport.readBack(spark, rootB)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(fpA.keySet === fpB.keySet)
    assert(fpA !== fpB) // a different salt reshuffles membership

    // null text: rides along with zero tokens, still fingerprinted
    val withNull = corpus.unionByName(
      Seq((99L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val rootN = freshRoot("null")
    val mN = ShardExport.write(spark, withNull, "doc_id", "text",
      budget = 25L, salt = "s1", rootN, bucketWidth = 8)
    assert(mN.agg(sum("n_docs")).head().getLong(0) === 41L)
    assert(ShardExport.readBack(spark, rootN).filter(col("text").isNull)
      .count() === 1L)
  }

  test("empty corpus commits an empty manifest; readBack refuses with a clear message") {
    val root = freshRoot("empty")
    val m = ShardExport.write(spark, corpus.limit(0), "doc_id", "text",
      budget = 25L, salt = "s1", root)
    assert(m.count() === 0L)
    assert(ShardExport.manifestFromData(spark, root, "doc_id", "text")
      .count() === 0L)
    val ex = intercept[IllegalArgumentException] {
      ShardExport.readBack(spark, root)
    }
    assert(ex.getMessage.contains("empty"))

    // reserved output names in the input fail fast instead of colliding
    val ex2 = intercept[IllegalArgumentException] {
      ShardExport.assignShards(corpus.withColumn("shard", lit(1)),
        "doc_id", "text", budget = 25L, salt = "s1")
    }
    assert(ex2.getMessage.contains("collide"))
  }
}
