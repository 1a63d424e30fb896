package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Graph}

/** [[graft.operators.Graph.pageRank]] — the fixed-point arithmetic is
  * exact, so tests assert EQUALITY on rank units (no epsilons): a
  * symmetric cycle is a fixed point, a star funnels mass to its center
  * with hand-computed units, and partitioning cannot change a single
  * bit of the result.
  */
class GraphSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("pageRank: a symmetric 2-cycle is an exact fixed point at rank 1/2") {
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val got = Graph.pageRank(e, "src", "dst", iterations = 5)
      .select("node", "rank_units").as[(String, Long)].collect().toMap
    // r₀ = 5e11 each; every iteration: 0.15/2·1e12 + ⌊0.85·5e11⌋ = 5e11
    assert(got === Map("a" -> 500000000000L, "b" -> 500000000000L))
  }

  test("pageRank: star center absorbs damped mass — exact units after 1 iteration") {
    val e = Seq(("b", "a"), ("c", "a"), ("d", "a")).toDF("src", "dst")
    val got = Graph.pageRank(e, "src", "dst", iterations = 1)
      .select("node", "rank_units").as[(String, Long)].collect().toMap
    // n=4: r₀ = 2.5e11 each; center: 1.5e11/4 + ⌊0.85·7.5e11⌋ = 6.75e11;
    // leaves get teleport only (a is dangling — mass not redistributed)
    assert(got("a") === 675000000000L)
    assert(got("b") === 37500000000L)
    assert(got("c") === 37500000000L && got("d") === 37500000000L)
  }

  test("pageRank: bit-identical under repartitioning (integer state commutes)") {
    val docs = Tables.documents(spark, sf0001)
    val e = Corpus.bigramEdges(docs, "doc_id", "text")
    val a = Graph.pageRank(e, "src", "dst", iterations = 3)
      .select("node", "rank_units").as[(String, Long)].collect().toMap
    val b = Graph.pageRank(e.repartition(17), "src", "dst", iterations = 3)
      .select("node", "rank_units").as[(String, Long)].collect().toMap
    assert(a === b)
    assert(a.nonEmpty)
    // total mass stays within the documented floor-truncation leak
    val total = a.values.sum
    assert(total <= Graph.Scale && total > Graph.Scale / 2, s"mass $total")
  }

  test("pageRank: checkpointed lineage is bit-identical to the unrolled plan") {
    val docs = Tables.documents(spark, sf0001)
    val e = Corpus.bigramEdges(docs, "doc_id", "text")
    val unrolled = Graph.pageRank(e, "src", "dst", iterations = 7,
        checkpointEvery = 0)
      .select("node", "rank_units").as[(String, Long)].collect().toMap
    val cut = Graph.pageRank(e, "src", "dst", iterations = 7,
        checkpointEvery = 2)
      .select("node", "rank_units").as[(String, Long)].collect().toMap
    assert(cut === unrolled)
    assert(cut.nonEmpty)
  }

  test("pageRank: exact L1 convergence stop halts at a fixed point, same bits") {
    // the symmetric 2-cycle is a fixed point from iteration 1, so the
    // integer delta is exactly 0 and the stop fires immediately
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val full = Graph.pageRank(e, "src", "dst", iterations = 10)
      .select("node", "rank_units").as[(String, Long)].collect().toMap
    val stopped = Graph.pageRank(e, "src", "dst", iterations = 10,
        convergeL1Units = 1L)
      .select("node", "rank_units").as[(String, Long)].collect().toMap
    assert(Graph.lastIterationsRun === 1, "stop did not fire at the fixed point")
    assert(stopped === full)
  }

  test("pageRank: convergence stop does not trigger before the threshold") {
    // star graph keeps shifting mass for several rounds; with an
    // impossible threshold of 0 ... 1 unit the run must NOT stop early
    // unless the delta truly reaches it
    val docs = Tables.documents(spark, sf0001)
    val e = Corpus.bigramEdges(docs, "doc_id", "text")
    val a = Graph.pageRank(e, "src", "dst", iterations = 4, convergeL1Units = 1L)
      .select("node", "rank_units").as[(String, Long)].collect().toMap
    val ran = Graph.lastIterationsRun
    val b = Graph.pageRank(e, "src", "dst", iterations = 4)
      .select("node", "rank_units").as[(String, Long)].collect().toMap
    // bigram graph at this size does not hit an exact fixed point in 4
    // rounds — the convergence path must agree with the plain path
    assert(ran === 4)
    assert(a === b)
  }

  test("bigramEdges: distinct adjacent pairs only") {
    val d = Seq((1L, "x y x y"), (2L, "y z")).toDF("doc_id", "text")
    val got = Corpus.bigramEdges(d, "doc_id", "text")
      .as[(String, String)].collect().toSet
    assert(got === Set(("x", "y"), ("y", "x"), ("y", "z")))
  }

  test("hits: hand-computed integer units after one mutual-recursion step") {
    // 1,2,3 → 4 and 1 → 5: node 4 is the authority, node 1 the best hub
    val e = Seq(("1", "4"), ("2", "4"), ("3", "4"), ("1", "5")).toDF("src", "dst")
    val got = Graph.hits(e, "src", "dst", iterations = 1)
      .select("node", "auth_units", "hub_units")
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // h0 = 1e6 div 5 = 200000 each.
    // araw: 4 → 600000, 5 → 200000; Σ = 800000 → a = 750000 / 250000.
    // hraw: 1 → a(4)+a(5) = 1e6, 2 → 750000, 3 → 750000; Σ = 2.5e6
    //   → h = 400000 / 300000 / 300000.
    assert(got === Map(
      "1" -> (0L, 400000L), "2" -> (0L, 300000L), "3" -> (0L, 300000L),
      "4" -> (750000L, 0L), "5" -> (250000L, 0L)))
  }

  test("hits: bit-identical under repartitioning and checkpointing") {
    val docs = Tables.documents(spark, sf0001).limit(120)
    val e = Corpus.bigramEdges(docs, "doc_id", "text")
    val base = Graph.hits(e, "src", "dst", iterations = 3, checkpointEvery = 0)
      .select("node", "auth_units", "hub_units")
      .as[(String, Long, Long)].collect().toSet
    val repart = Graph.hits(e.repartition(17), "src", "dst", iterations = 3,
        checkpointEvery = 1)
      .select("node", "auth_units", "hub_units")
      .as[(String, Long, Long)].collect().toSet
    assert(base === repart)
    assert(base.exists(_._2 > 0L), "some authority mass must exist")
  }

  test("hits: L1 mass is conserved up to floor loss each half-step") {
    val docs = Tables.documents(spark, sf0001).limit(60)
    val e = Corpus.bigramEdges(docs, "doc_id", "text")
    val got = Graph.hits(e, "src", "dst", iterations = 2)
    val Array(sa, sh, n) = got
      .agg(sum($"auth_units"), sum($"hub_units"), count(lit(1)))
      .collect().head.toSeq.map(_.toString.toLong).toArray
    // each normalization floors per node: Σ ∈ (Scale − n, Scale]
    assert(sa <= Graph.HitsScale && sa > Graph.HitsScale - n)
    assert(sh <= Graph.HitsScale && sh > Graph.HitsScale - n)
  }
}
