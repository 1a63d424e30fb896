package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate nearest neighbor (the coarse
  * quantizer of Jégou, Douze & Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the second scale
  * path next to random-hyperplane LSH ([[Similarity.annTopKCosine]]):
  * a coarse k-means quantizer partitions the corpus into `nlist` cells;
  * a probe searches only its `nProbe` nearest cells.
  *
  * Scale design: training touches only (n × nlist) similarity rows per
  * Lloyd iteration with the centroid table broadcast (centroids are
  * metadata — nlist × dim doubles — so driver-side collection per
  * iteration is O(KB), not data-sized). Search is one equi-join on
  * `cell` followed by exact re-ranking of candidate cells only. At
  * 100 TB the assignment table would be written bucketed by `cell` so
  * repeated probes never reshuffle the corpus.
  */
object IvfIndex {

  /** Train the coarse quantizer and assign every vector to its cell.
    * Returns (assignments: [id, vec, cell], centroids: [cell, cvec]).
    * Init = first `nlist` vectors by id (deterministic); `iters` Lloyd
    * rounds of assign + per-dimension mean.
    */
  def fit(embeddings: DataFrame, idCol: String, vecCol: String,
          nlist: Int = 16, iters: Int = 5): (DataFrame, DataFrame) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus = embeddings
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"))
      .repartition(spark.sparkContext.defaultParallelism)

    // centroids are metadata (nlist × dim doubles): materialized to the
    // driver each round so the Lloyd iteration's lineage stays flat
    var cents: Seq[(Int, Seq[Double])] = corpus.orderBy("id").limit(nlist)
      .select(col("vec")).collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Double](0) }.toSeq

    def centDf: DataFrame = cents.toDF("cell", "cvec")
    def assign(c: DataFrame): DataFrame =
      corpus.crossJoin(broadcast(c))
        .withColumn("sim", VectorFunctions.cosineSimilarity(col("vec"), col("cvec")))
        .groupBy(col("id"), col("vec"))
        .agg(min(struct(negate(col("sim")), col("cell"))).as("best"))
        .select(col("id"), col("vec"), col("best.cell").as("cell"))

    var it = 0
    while (it < iters) {
      // per-dimension mean of each cell's members
      cents = assign(centDf)
        .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("v")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cvec"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toSeq
      it += 1
    }
    val finalCents = centDf
    (assign(finalCents), finalCents)
  }

  /** ANN search: route each probe to its `nProbe` nearest cells, rerank
    * exactly inside those cells only.
    */
  def search(assigned: DataFrame, centroids: DataFrame, probes: DataFrame,
             idCol: String, vecCol: String, k: Int, nProbe: Int = 3): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).cast("array<double>").as("pvec"))
    val routed = p.crossJoin(broadcast(centroids))
      .withColumn("csim", VectorFunctions.cosineSimilarity(col("pvec"), col("cvec")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("csim").desc, col("cell"))))
      .filter(col("crk") <= nProbe)
      .select(col("probe_id"), col("pvec"), col("cell"))

    val candidates = routed.join(assigned, "cell")
      .filter(col("id") =!= col("probe_id"))
      .withColumn("sim", VectorFunctions.cosineSimilarity(col("vec"), col("pvec")))
      .filter(col("sim").isNotNull)
    TopK.topKPerKey(candidates, Seq("probe_id"),
        struct(negate(col("sim")), col("id")), Seq("id", "sim"), k)
      .select(col("probe_id"), col("id").as("vec_id"), col("rk"),
        round(col("sim"), 4).as("sim_r"))
  }

  /** fit + search in one call (index reuse callers should fit once). */
  def annTopK(embeddings: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
              k: Int, nlist: Int = 16, nProbe: Int = 3, iters: Int = 3): DataFrame = {
    val (assigned, centroids) = fit(embeddings, idCol, vecCol, nlist, iters)
    search(assigned, centroids, probes, idCol, vecCol, k, nProbe)
  }
}
