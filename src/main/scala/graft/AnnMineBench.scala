package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** The recall-vs-cost trade behind
  * [[graft.operators.Similarity.marginMiningAnn]]'s multiprobe stage:
  * against the exact miner's mined pairs on the sf embeddings (split
  * even/odd into the two "languages"), each (tables, probes) setting
  * reports its candidate-pair volume — the quantity that prices the
  * shuffle at 100 TB — and the fraction of exact pairs recovered.
  * Multiprobe multiplies only the PROBE side's bucket rows by
  * (1 + probes); a new table re-hashes BOTH sides, which is why
  * probes buy recall cheaper than tables (the Lv et al. 2007
  * argument, measured here).
  *
  * Prints one JSON line per setting:
  * `{"metric":"ann_mine_recall","tables":T,"probes":P,
  *   "candidates":N,"recall":R,"sec":S}`.
  * Recorded in BASELINE.md (`ann_mine_recall`).
  */
object AnnMineBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val a = e.filter(pmod(col("vec_id"), lit(2)) === 0)
    val b = e.filter(pmod(col("vec_id"), lit(2)) === 1)
    val exact = graft.operators.Similarity
      .marginMining(a, b, "vec_id", "embedding", k = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    // candidate volume of the bucket join alone (distinct pairs scored)
    def candidates(tables: Int, probes: Int): Long = {
      def wb(df: DataFrame, id: String, nP: Int): DataFrame =
        df.select(col(id), explode(concat((0 until tables).map { t =>
          transform(
            ColumnBridge.column(graft.functions.RandomHyperplaneMultiprobe(
              ColumnBridge.expression(col("embedding")), 8, 42L + t, nP)),
            s => struct(lit(t).as("t"), s.as("sig")))
        }: _*)).as("bucket"))
      wb(a.select(col("vec_id").as("a_id"), col("embedding")), "a_id", probes)
        .join(wb(b.select(col("vec_id").as("b_id"), col("embedding")), "b_id", 0),
          "bucket")
        .filter(col("a_id") =!= col("b_id"))
        .select("a_id", "b_id").distinct().count()
    }

    for ((tables, probes) <- Seq((8, 0), (16, 0), (32, 0), (8, 1), (8, 2), (16, 2))) {
      val t0 = System.nanoTime()
      val mined = graft.operators.Similarity
        .marginMiningAnn(a, b, "vec_id", "embedding", k = 4,
          tables = tables, probes = probes)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = if (exact.isEmpty) 1.0
        else (mined & exact).size.toDouble / exact.size
      println(f"""{"metric":"ann_mine_recall","tables":$tables,"probes":$probes,""" +
        f""""candidates":${candidates(tables, probes)},"recall":$recall%.4f,"sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
