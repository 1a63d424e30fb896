package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.NumFunctions

/** Embedding compression for the 100 TB similarity path: int8 scalar
  * quantization (per-dimension affine codes — the storage/IO face) and
  * product quantization with asymmetric-distance search (Jégou, Douze &
  * Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
  * 2011 — the in-memory face). A 64-dim float corpus stores 256 B/row;
  * SQ8 stores 64 B and PQ(m=8) stores 8 B — the difference between an
  * index that fits executor memory at 100 TB and one that cannot.
  *
  * Scale design: both trainers aggregate KB-scale metadata (per-dim
  * min/max; per-subspace centroids) and encode with pure MAP-SIDE
  * projections carrying that metadata as expression literals — the
  * corpus itself never shuffles to be quantized, exactly the
  * [[IvfIndex]] pattern.
  */
object Quantize {

  /** Per-dimension (min, max) over the corpus: posexplode → partial
    * min/max per partition (d rows each) → one d-row shuffle. Returns
    * `(pos, mn, mx)` as DOUBLE (exact widenings of the float inputs).
    */
  def dimStats(embeddings: DataFrame, vecCol: String): DataFrame =
    embeddings
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v")).cast("double").as("mn"),
           max(col("v")).cast("double").as("mx"))

  /** int8 scalar quantization: `code = floor((v - mn) * 255 / (mx - mn))`
    * clamped to [0, 255] (a constant dimension codes to 0). Arithmetic
    * is double-widened so codes are bit-reproducible against a SQL
    * oracle computing the same formula. Output is the exploded code
    * table `(id, pos, code)` — the shape a columnar sink or a
    * per-dimension analysis consumes; re-packing to `array<tinyint>`
    * is a `collect_list` away when a row-wise layout is wanted.
    *
    * The stats collect is d rows of driver metadata; encoding is one
    * map-side pass (no join against the stats table, which would
    * shuffle-or-broadcast per batch — the literal array is cheaper and
    * makes the encoder a self-contained projection).
    */
  def scalarQuantize(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val stats = dimStats(embeddings, vecCol).orderBy("pos").collect()
    val mn = stats.map(_.getDouble(1))
    val mx = stats.map(_.getDouble(2))
    val mnLit = typedLit(mn.toSeq)
    val mxLit = typedLit(mx.toSeq)
    embeddings
      .select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .withColumn("__mn", element_at(mnLit, col("pos") + 1))
      .withColumn("__mx", element_at(mxLit, col("pos") + 1))
      .select(col("id"), col("pos"),
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(
            floor((col("v").cast("double") - col("__mn")) * 255.0 /
              (col("__mx") - col("__mn"))),
            lit(255L)))
          .as("code"))
  }

  /** Train per-subspace PQ codebooks: the vector splits into `m` equal
    * slices; each slice gets `ksub` centroids via Lloyd iterations.
    * Init is the first `ksub` vectors by id (deterministic, as
    * [[IvfIndex.fit]]). Returns codebooks(sub)(centroid)(dim/m) — a
    * `m × ksub × (d/m)` double array, KB-scale driver metadata.
    *
    * Each Lloyd round is one job over the corpus: per-subspace nearest
    * centroid is a map-side projection; the centroid update partial-
    * aggregates to `m × ksub × (d/m)` rows per partition before its
    * only shuffle.
    */
  def fitPq(embeddings: DataFrame, idCol: String, vecCol: String,
            m: Int = 8, ksub: Int = 16, iters: Int = 5): Array[Array[Array[Double]]] = {
    require(m > 0 && ksub > 0, s"m and ksub must be positive, got m=$m ksub=$ksub")
    // per-row encode cost scales with the sub-codebook size
    val corpus = Similarity.spreadIfNarrow(embeddings
        .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"))
        .filter(col("vec").isNotNull), computeWeight = ksub.toLong)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val d = corpus.select(size(col("vec"))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val dsub = d / m

    // deterministic init: subvectors of the first ksub rows by id
    val init = corpus.orderBy("id").limit(ksub).select(col("vec")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(init.length >= ksub,
      s"fitPq: corpus has only ${init.length} rows; need >= ksub = $ksub")
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m, ksub)((s, c) => init(c).slice(s * dsub, (s + 1) * dsub))

    var it = 0
    while (it < iters) {
      // one pass: for every subspace, assign (argmin L2 against the
      // in-expression codebook) and emit (sub, centroid, pos, v) for the
      // mean update; map-side combine collapses to m*ksub*dsub rows
      val assigned = corpus.select(
        (0 until m).map { s =>
          graft.functions.VectorFunctions.nearestCentroidL2(
            slice(col("vec"), s * dsub + 1, dsub), books(s)).as(s"__c$s")
        } :+ col("vec"): _*)
      val means = assigned
        .select(explode(array((0 until m).map { s =>
          struct(lit(s).as("sub"), col(s"__c$s").as("cent"),
            slice(col("vec"), s * dsub + 1, dsub).as("sv"))
        }: _*)).as("e"))
        .select(col("e.sub"), col("e.cent"), posexplode(col("e.sv")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("cent"), col("pos"))
        // decimal-routed mean: order-independent fold, so the trained
        // codebooks are replay-stable and SQL-replayable (the q94
        // oracle unrolls these rounds) — the IvfIndex.fit recipe.
        // (38,18) = 20 integer digits: lossless for |v| < 1e20
        .agg((sum(col("v").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast("double") / count(lit(1))).as("mean"))
        .collect()
      val next = books.map(_.map(_.clone()))
      means.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3)) {
          val s = r.getInt(0); val c = r.getInt(1); val p = r.getInt(2)
          if (s >= 0 && s < m && c >= 0 && c < ksub && p < dsub)
            next(s)(c)(p) = r.getDouble(3)
        }
      }
      books = next
      it += 1
    }
    corpus.unpersist(blocking = false)
    books
  }

  // trained codebooks keyed by (application, corpus key, params): plain
  // driver-side arrays (KB-scale), so unlike [[IvfIndex.fitCached]] there
  // are no cached DataFrames to evict — entries for dead applications are
  // dropped lazily whenever a new application trains, bounding growth in
  // a long-lived multi-session JVM.
  private val fittedBooks =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Double]]]]()

  /** [[fitPq]] memoized per (session application, `key`, params): the
    * build-once / probe-many index lifecycle — a bench loop or probe
    * stream reuses the trained codebooks instead of re-running Lloyd
    * rounds per call.
    */
  def fitPqCached(key: String, embeddings: DataFrame, idCol: String, vecCol: String,
                  m: Int = 8, ksub: Int = 16, iters: Int = 5): Array[Array[Array[Double]]] = {
    val app = embeddings.sparkSession.sparkContext.applicationId
    val full = s"$app|$key|$m|$ksub|$iters"
    val hit = fittedBooks.get(full)
    if (hit != null) hit
    else {
      val it = fittedBooks.keySet.iterator()
      while (it.hasNext) { if (!it.next().startsWith(app + "|")) it.remove() }
      fittedBooks.computeIfAbsent(full,
        _ => fitPq(embeddings, idCol, vecCol, m, ksub, iters))
    }
  }

  /** Encode the corpus against trained codebooks: `(id, codes)` where
    * `codes(s)` is the nearest (L2) centroid of subspace `s` — a pure
    * map-side projection, `m` bytes of index per vector at ksub ≤ 256.
    */
  def encodePq(embeddings: DataFrame, idCol: String, vecCol: String,
               books: Array[Array[Array[Double]]]): DataFrame = {
    val m = books.length
    val dsub = books(0)(0).length
    embeddings
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"))
      .filter(col("vec").isNotNull)
      .select(col("id"), array((0 until m).map { s =>
        graft.functions.VectorFunctions.nearestCentroidL2(
          slice(col("vec"), s * dsub + 1, dsub), books(s))
      }: _*).as("codes"))
  }

  /** Asymmetric-distance top-k: score every encoded row against each
    * probe through a per-probe lookup table (LUT[sub][centroid] =
    * dot(probe_sub, centroid)) — the probe stays full-precision, the
    * corpus is never decoded. LUTs for all probes are expression
    * literals (|probes| × m × ksub doubles — probes are small by the
    * same contract as [[Similarity.topKCosine]]); scoring is one
    * map-side pass over the codes, ranking is the bounded-heap
    * per-probe top-k. Returns `(probe_id, id, score)`, score =
    * approximate inner product.
    */
  def pqTopK(encoded: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
             books: Array[Array[Array[Double]]], k: Int,
             maxProbes: Int = 10000): DataFrame = {
    val m = books.length
    val dsub = books(0)(0).length
    val pRows = probes
      .select(col(idCol).cast("long").as("probe_id"), col(vecCol).cast("array<double>").as("pvec"))
      .filter(col("pvec").isNotNull)
      .limit(maxProbes + 1).collect()
    require(pRows.length <= maxProbes,
      s"pqTopK: probe set exceeds maxProbes = $maxProbes rows; LUTs are " +
        "replicated into every task — keep probes small or raise maxProbes " +
        "deliberately")
    // per-probe LUT flattened to m*ksub doubles: lut(s*ksub + c)
    val luts: Seq[(Long, Seq[Double])] = pRows.toSeq.map { r =>
      val pid = r.getLong(0)
      val pv = r.getSeq[Double](1).toArray
      val flat = new Array[Double](m * books(0).length)
      var s = 0
      while (s < m) {
        var c = 0
        while (c < books(s).length) {
          var acc = 0.0; var j = 0
          while (j < dsub && s * dsub + j < pv.length) {
            acc += pv(s * dsub + j) * books(s)(c)(j); j += 1
          }
          flat(s * books(s).length + c) = acc
          c += 1
        }
        s += 1
      }
      (pid, flat.toSeq)
    }
    val spark = encoded.sparkSession
    import spark.implicits._
    val lutDf = luts.toDF("probe_id", "lut")
    val scored = Similarity.spreadIfNarrow(encoded)
      .crossJoin(broadcast(lutDf))
      .filter(col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id"),
        graft.functions.VectorFunctions.pqAdcScore(col("codes"), col("lut"),
          books(0).length).as("score"))
      .filter(col("score").isNotNull)
    TopK.topKPerKey(scored, Seq("probe_id"),
        struct(negate(col("score")), col("id")), Seq("id", "score"), k)
      .select(col("probe_id"), col("id"), col("rk"),
        NumFunctions.roundNz(col("score"), 4).as("score_r"))
  }

  /** PQ search with exact re-rank — the production recipe: L2-normalize
    * (so ADC's inner product approximates cosine), ADC-shortlist
    * `shortlist` candidates per probe from the codes alone, then exact
    * cosine over ONLY the shortlist. Returns `(probe_id, vec_id, rk,
    * sim_r)` — the [[Similarity.topKCosine]] output contract. `books`
    * must be trained on the SAME normalization ([[fitPq]] over
    * L2-normalized vectors), or the codes quantize a different space
    * than the probes score.
    *
    * Scale: the exact phase touches `|probes| × shortlist` corpus rows
    * (a broadcast-able id set), not the corpus — the full-precision
    * vectors are fetched by equi-join, never scanned. Recall is
    * governed by `shortlist` and the codebook size; the codes table is
    * `m` bytes per row, so the shortlist scan runs over an index ~30×
    * smaller than the float corpus.
    */
  /** Full IVF-PQ ANN (Jégou et al., TPAMI 2011 — the composed system):
    * the coarse quantizer ([[IvfIndex]]) bounds WHICH rows are scored
    * (only the probe's `nProbe` nearest cells), the PQ codes bound WHAT
    * is read to score them (m bytes per row, ADC lookup tables, vectors
    * untouched), and an exact cosine re-rank over the shortlist
    * restores precision. Everything runs in the L2-normalized space so
    * ADC's inner product approximates cosine.
    *
    * `residual = false` encodes raw normalized vectors (IVFFlat-style
    * codes). `residual = true` is the Jégou-paper refinement: codes
    * quantize `v − centroid(cell)` — residuals concentrate near the
    * origin, so the same (m, ksub) code budget spends its resolution
    * on the part of the vector the coarse quantizer did NOT explain.
    * ADC then scores `p·v = p·centroid + p·residual`: the first term
    * is a per-(probe, cell) BIAS computed on the driver (cell
    * metadata), the second the usual LUT sum — same join, same plan,
    * one extra broadcast column. Recall at the same operating point
    * measured in BASELINE.md `pq_recall`.
    *
    * Scale: probes collect to the driver (routing + LUTs are per-probe
    * metadata, bounded by `maxProbes`); the codes table streams through
    * ONE broadcast join on `cell`; the re-rank fetches `|probes| ×
    * shortlist` full vectors by equi-join. At 100 TB the codes table is
    * ~30× smaller than the corpus and the cell join prunes it another
    * `nlist / nProbe`×.
    */
  def ivfPqTopK(embeddings: DataFrame, probes: DataFrame, idCol: String,
                vecCol: String, k: Int, nlist: Int = 16, nProbe: Int = 4,
                m: Int = 8, ksub: Int = 16, iters: Int = 3,
                shortlist: Int = 50, cacheKey: Option[String] = None,
                maxProbes: Int = 10000, residual: Boolean = false): DataFrame = {
    import graft.functions.VectorFunctions
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus = embeddings
      .select(col(idCol).as("id"), VectorFunctions.l2Normalize(col(vecCol)).as("nvec"))
    val (assigned, centroids) = cacheKey match {
      case Some(ck) => IvfIndex.fitCached(s"$ck|ivfpq", corpus, "id", "nvec", nlist, iters)
      case None     => IvfIndex.fit(corpus, "id", "nvec", nlist, iters)
    }
    // what the PQ books quantize: the vector itself, or the residual
    // v − centroid(cell) (a broadcast join on cell metadata, map-side)
    val encSrc =
      if (residual)
        assigned.join(broadcast(centroids.select(col("cell"), col("cvec"))), "cell")
          .select(col("id"), col("cell"),
            zip_with(col("vec"), col("cvec"), (a, b) => a - b).as("evec"))
      else assigned.select(col("id"), col("cell"), col("vec").as("evec"))
    val books = cacheKey match {
      case Some(ck) => fitPqCached(s"$ck|ivfpq|res=$residual", encSrc, "id", "evec",
        m, ksub, iters)
      case None     => fitPq(encSrc, "id", "evec", m, ksub, iters)
    }
    val dsub = books(0)(0).length
    val encoded = encSrc.select(col("id"), col("cell"),
      array((0 until m).map { s =>
        VectorFunctions.nearestCentroidL2(
          slice(col("evec"), s * dsub + 1, dsub), books(s))
      }: _*).as("codes"))

    // probe-side metadata on the driver: normalize, route to nProbe
    // cells by cosine against the (tiny) centroid table, build the LUT
    val pRows = probes
      .select(col(idCol).cast("long").as("probe_id"),
        VectorFunctions.l2Normalize(col(vecCol)).as("pvec"))
      .filter(col("pvec").isNotNull)
      .limit(maxProbes + 1).collect()
    require(pRows.length <= maxProbes,
      s"ivfPqTopK: probe set exceeds maxProbes = $maxProbes rows; routing " +
        "tables replicate per task — keep probes small or raise maxProbes " +
        "deliberately")
    val cents = centroids.select(col("cell"), col("cvec")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) Double.NegativeInfinity
      // sqrt(na) * sqrt(nb), NOT sqrt(na * nb): bit-identical to the
      // CosineSimilarity expression and DuckDB's list_cosine_similarity,
      // so the q101 oracle's cell routing replays rank-for-rank
      else d / (math.sqrt(na) * math.sqrt(nb))
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { d += a(i) * b(i); i += 1 }
      d
    }
    val routed: Seq[(Long, Int, Seq[Double], Double)] = pRows.toSeq.flatMap { r =>
      val pid = r.getLong(0)
      val pv = r.getSeq[Double](1).toArray
      val lut = new Array[Double](m * ksub)
      var s = 0
      while (s < m) {
        var c = 0
        while (c < books(s).length) {
          var acc = 0.0; var j = 0
          while (j < dsub && s * dsub + j < pv.length) {
            acc += pv(s * dsub + j) * books(s)(c)(j); j += 1
          }
          lut(s * ksub + c) = acc; c += 1
        }
        s += 1
      }
      cents.map { case (cell, cv) => (cell, cosine(pv, cv)) }
        .sortBy { case (cell, sim) => (-sim, cell) }
        .take(nProbe)
        .map { case (cell, _) =>
          // residual ADC: p·v = p·centroid (this bias) + p·residual (LUT)
          val bias =
            if (residual) dot(pv, cents.find(_._1 == cell).get._2) else 0.0
          (pid, cell, lut.toSeq, bias)
        }
    }
    val routedDf = routed.toDF("probe_id", "cell", "lut", "bias")
    val scored = encoded.join(broadcast(routedDf), "cell")
      .filter(col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id"),
        (graft.functions.VectorFunctions.pqAdcScore(col("codes"), col("lut"), ksub)
          + col("bias")).as("score"))
      .filter(col("score").isNotNull)
    val short = TopK.topKPerKey(scored, Seq("probe_id"),
      struct(negate(col("score")), col("id")), Seq("id"), shortlist)

    val pDf = pRows.toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toDF("probe_id", "pvec")
    val rer = short.select(col("probe_id"), col("id"))
      .join(corpus.withColumnRenamed("nvec", "cvec"), "id")
      .join(broadcast(pDf), "probe_id")
      .withColumn("sim", VectorFunctions.cosineSimilarity(col("cvec"), col("pvec")))
      .filter(col("sim").isNotNull)
    TopK.topKPerKey(rer, Seq("probe_id"),
        struct(negate(col("sim")), col("id")), Seq("id", "sim"), k)
      .select(col("probe_id"), col("id").as("vec_id"), col("rk"),
        NumFunctions.roundNz(col("sim"), 4).as("sim_r"))
  }

  def pqTopKRefined(embeddings: DataFrame, probes: DataFrame, idCol: String,
                    vecCol: String, books: Array[Array[Array[Double]]],
                    k: Int, shortlist: Int = 50,
                    maxProbes: Int = 10000): DataFrame = {
    import graft.functions.VectorFunctions
    val corpus = embeddings
      .select(col(idCol).as("id"), VectorFunctions.l2Normalize(col(vecCol)).as("nvec"))
    val p = probes
      .select(col(idCol).as("probe_id"), VectorFunctions.l2Normalize(col(vecCol)).as("pvec"))
    val enc = encodePq(corpus, "id", "nvec", books)
    val short = pqTopK(enc, p.select(col("probe_id").as("id"), col("pvec").as("vec")),
      "id", "vec", books, shortlist, maxProbes)
    val rer = short.select(col("probe_id"), col("id"))
      .join(corpus.withColumnRenamed("nvec", "cvec"), "id")
      .join(broadcast(p), "probe_id")
      .withColumn("sim", VectorFunctions.cosineSimilarity(col("cvec"), col("pvec")))
      .filter(col("sim").isNotNull)
    TopK.topKPerKey(rer, Seq("probe_id"),
        struct(negate(col("sim")), col("id")), Seq("id", "sim"), k)
      .select(col("probe_id"), col("id").as("vec_id"), col("rk"),
        NumFunctions.roundNz(col("sim"), 4).as("sim_r"))
  }
}
