package graft

import org.apache.spark.sql.functions._

/** Scale evidence for the perceptual-dedup tier (q182/q184/q185):
  * [[graft.multimodal.Multimodal.hammingNearDupPairs]] claims banded
  * pairing cost tracks true duplicate-class mass (8-byte hashes
  * through the shuffle, bucket sizes bounded by class sizes), and
  * [[graft.multimodal.Multimodal.incrementalHammingNearDup]] claims
  * the standing index reaches the probe with ZERO corpus-side shuffle.
  * This main MEASURES both on a deterministic synthetic hash corpus
  * (planted duplicate classes of 4 over a hash space with ~30-bit
  * cross-class distances — content is pure id arithmetic, reruns
  * measure the same data) at two sizes, reporting wall seconds and
  * shuffle bytes; the brute-force cross-join alternative at the small
  * size anchors the gap.
  *
  * Prints one JSON line per row:
  * `{"metric":"media_dedup","mode":…,"n":…,"sec":…,"shuffle_kb":…}`.
  * Recorded in BASELINE.md (`media_dedup`).
  */
object MediaDedupBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(500000L, 2000000L)

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    // duplicate classes of 4: ids sharing id/4 share a base hash; the
    // in-class variants flip 0-2 bits (ham <= 2 pairs); cross-class
    // hashes xxhash64-spread (~32 bits apart)
    def hashes(n: Long) = spark.range(n).select(col("id").as("media_id"),
      xxhash64((col("id") / 4).cast("long"))
        .bitwiseXOR(shiftleft(pmod(col("id"), lit(4)), 5)).as("h"))
      .persist()

    def timed(tag: String, n: Long)(body: => Long): Unit = {
      Thread.sleep(300)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"""{"metric":"media_dedup","mode":"$tag","n":$n,"rows":$rows,""" +
        f""""sec":$sec%.2f,"shuffle_kb":${shuffleBytes.get() / 1024}}""")
    }

    sizes.foreach { n =>
      val hs = hashes(n); hs.count()
      timed("banded", n) {
        graft.multimodal.Multimodal.hammingNearDupPairs(hs, "media_id", "h").count()
      }
      val batch = hs.filter(pmod(col("media_id"), lit(100)) === 0)
      timed("incremental", n) {
        graft.multimodal.Multimodal.incrementalHammingNearDup(
          batch, hs, "media_id", "h").count()
      }
      hs.unpersist(blocking = true)
    }
    // brute-force anchor at the small size only (quadratic)
    val small = hashes(20000L); small.count()
    timed("brute", 20000L) {
      val a = small.select(col("media_id").as("a_id"), col("h").as("ha"))
      val b = small.select(col("media_id").as("b_id"), col("h").as("hb"))
      a.join(b, col("a_id") < col("b_id"))
        .filter(expr("bit_count(ha ^ hb)") <= 3).count()
    }
    spark.stop()
  }
}
