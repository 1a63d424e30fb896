package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** SemDeDup semantics pinned on planted clusters: near-identical vector
  * groups collapse to their lowest-id survivor; distant vectors survive
  * untouched; invariants hold on the fixture corpus.
  */
class SemanticDedupSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  // three tight groups along distinct axes + two far singletons;
  // within-group cosine ~0.9997, cross-group ~0 — any clustering that
  // separates the axes keeps each group in one cell
  private def planted = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.02f)),
    (2L, Seq(1.0f, 0.01f, 0.0f, 0.0f)),
    (3L, Seq(0.99f, 0.0f, 0.01f, 0.0f)),
    (10L, Seq(0.0f, 1.0f, 0.0f, 0.01f)),
    (11L, Seq(0.0f, 1.0f, 0.01f, 0.0f)),
    (20L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
    (30L, Seq(0.5f, 0.5f, 0.5f, 0.5f))).toDF("vec_id", "vec")

  test("planted duplicate groups collapse to their lowest-id survivor") {
    val out = Dedup.semanticDedup(planted, "vec_id", "vec",
        nlist = 4, tau = 0.99, iters = 4)
      .select(col("id"), col("survivor_id"), col("is_survivor"))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val surv = out.map(r => r._1 -> r._2).toMap
    assert(surv(1L) === 1L && surv(2L) === 1L && surv(3L) === 1L)
    assert(surv(10L) === 10L && surv(11L) === 10L)
    assert(surv(20L) === 20L && surv(30L) === 30L)
    assert(out.filter(_._3).map(_._1).toSet === Set(1L, 10L, 20L, 30L))
  }

  test("every row appears exactly once; survivor is the component minimum") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val out = Dedup.semanticDedup(e, "vec_id", "embedding",
        nlist = 8, tau = 0.42, iters = 3)
      .select(col("id"), col("survivor_id"), col("is_survivor"))
      .as[(Long, Long, Boolean)].collect()
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.length === e.count())
    // survivor id never exceeds the member id (min-of-component rule)
    assert(out.forall { case (id, s, _) => s <= id })
    // is_survivor consistent, and each component's survivor is a member
    assert(out.forall { case (id, s, f) => f === (id == s) })
    val ids = out.map(_._1).toSet
    assert(out.map(_._2).toSet.subsetOf(ids))
  }

  test("tau above the fixture cosine ceiling keeps every row a survivor") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val out = Dedup.semanticDedup(e, "vec_id", "embedding",
      nlist = 4, tau = 0.95, iters = 2)
    assert(out.filter(!col("is_survivor")).count() === 0)
  }
}
