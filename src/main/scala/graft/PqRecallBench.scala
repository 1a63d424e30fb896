package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quantize, Similarity}
import graft.functions.VectorFunctions

/** Recall/cost frontier for the PQ and IVF-PQ ANN paths — the
  * `ann_mine_recall` methodology applied to the quantized tier: sweep
  * the two dials that buy recall (multiprobe cells `nProbe`, ADC
  * shortlist size) and record recall@10 vs brute-force cosine plus
  * wall time, so the q94/q101 operating points are CHOSEN numbers,
  * not defaults. Candidate volume scales ~`nProbe/nlist` (cells
  * scored) × `shortlist` (vectors re-ranked); both stay metadata-cheap
  * because scoring touches m-byte codes, never raw vectors.
  *
  * Prints one JSON line:
  * `{"metric":"pq_recall","rows":N,
  *   "ivfpq":[{"nProbe":…,"shortlist":…,"recall":…,"sec":…},…],
  *   "pq":[{"shortlist":…,"recall":…,"sec":…},…]}`.
  * Recorded per round in BASELINE.md (`pq_recall`).
  */
object PqRecallBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val e = spark.read.parquet(s"$dir/embeddings.parquet").persist()
    val n = e.count()
    val probes = e.filter(col("vec_id") < 10)
    val want = Similarity.topKCosine(e, probes, "vec_id", "embedding", k = 10)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recOf(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val t0 = System.nanoTime()
      val got = df.select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      ((got & want).size.toDouble / want.size, sec)
    }

    val ivf = (for ((np, sl) <- Seq((2, 50), (4, 50), (4, 100), (6, 100), (8, 150));
                    res <- Seq(false, true)) yield {
      val (r, s) = recOf(Quantize.ivfPqTopK(e, probes, "vec_id", "embedding",
        k = 10, nlist = 16, nProbe = np, shortlist = sl, residual = res))
      s"""{"nProbe":$np,"shortlist":$sl,"residual":$res,"recall":$r,"sec":$s}"""
    }).toSeq
    val norm = e.select(col("vec_id").as("id"),
      VectorFunctions.l2Normalize(col("embedding")).as("nvec"))
    val books = Quantize.fitPq(norm, "id", "nvec", m = 8, ksub = 16, iters = 5)
    val pq = Seq(25, 50, 100, 200).map { sl =>
      val (r, s) = recOf(Quantize.pqTopKRefined(e, probes, "vec_id", "embedding",
        books, k = 10, shortlist = sl))
      s"""{"shortlist":$sl,"recall":$r,"sec":$s}"""
    }
    println(s"""{"metric":"pq_recall","rows":$n,""" +
      s""""ivfpq":[${ivf.mkString(",")}],"pq":[${pq.mkString(",")}]}""")
    spark.stop()
  }
}
