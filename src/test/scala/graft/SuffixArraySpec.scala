package graft

import org.apache.spark.sql.DataFrame
import graft.operators.SuffixArray

/** [[graft.operators.SuffixArray.repeatProfile]] — the exact
  * repeated-span profile: brute-force equality, the truncation-as-cap
  * convention, degenerate inputs, and partitioning invariance.
  */
class SuffixArraySpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  /** max-over-all-pairs reference: every suffix against every other. */
  private def brute(rows: Seq[(Long, String)], maxOrder: Int,
                    minLen: Int): Map[Long, (Long, Long, Long)] = {
    val all = rows.flatMap { case (id, t) =>
      (0 until t.length).map(i => (id, i + 1, t.substring(i)))
    }
    def lcp(a: String, b: String): Int = {
      var i = 0
      val n = math.min(math.min(a.length, b.length), maxOrder)
      while (i < n && a(i) == b(i)) i += 1
      i
    }
    all.map { case (id, p, s) =>
      (id, all.filter(o => !(o._1 == id && o._2 == p))
        .map(o => lcp(s, o._3)).max)
    }.groupBy(_._1).map { case (id, xs) =>
      id -> ((xs.length.toLong, xs.map(_._2).max.toLong,
        xs.map(_._2).count(_ >= minLen).toLong))
    }
  }

  private def run(df: DataFrame, maxOrder: Int = 32,
                  minLen: Int = 10): Map[Long, (Long, Long, Long)] =
    SuffixArray.repeatProfile(df, "doc_id", "text", maxOrder, minLen)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

  private val fixture = Seq(
    1L -> "abcdefghij_THE_SHARED_SPAN_xyz",
    2L -> "qrs_THE_SHARED_SPAN_uvw",
    3L -> "nothing in common here!",
    4L -> "zz",
    5L -> "aaaaaaaa",          // run-length: overlapping self-repeats
    6L -> "aaaa",              // run shared with doc 5
    7L -> "identical twin doc",
    8L -> "identical twin doc", // byte-identical pair
    9L -> "prefix",
    10L -> "prefix and then some more text")

  test("repeatProfile matches the all-pairs brute force") {
    val got = run(fixture.toDF("doc_id", "text"))
    val want = brute(fixture, maxOrder = 32, minLen = 10)
    assert(got === want)
  }

  test("a span longer than maxOrder is reported AT the cap") {
    val span = "S" * 50
    val d = Seq(1L -> s"left_$span", 2L -> s"other_$span").toDF("doc_id", "text")
    val got = run(d, maxOrder = 16, minLen = 8)
    assert(got(1L)._2 === 16L, "max_rep is capped at maxOrder")
    assert(got(2L)._2 === 16L)
  }

  test("null and empty texts contribute nothing; lone docs still profile") {
    val d = Seq((1L, "shared words here"), (2L, "shared words there"),
      (3L, ""), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = run(d)
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L)._2 >= 13L, "the 'shared words ' prefix repeats")
  }

  test("profile is invariant under adversarial repartitioning") {
    val df = fixture.toDF("doc_id", "text")
    val a = run(df.repartition(13))
    val b = run(df.repartition(1))
    assert(a === b)
  }

  /** brute-force removal witness: per position the max pairwise LCP,
    * union the qualifying spans into a covered mask, keep the rest. */
  private def bruteClean(rows: Seq[(Long, String)], maxOrder: Int,
                         minLen: Int): Map[Long, (String, Long, Long)] = {
    val all = rows.filter(_._2.nonEmpty).flatMap { case (id, t) =>
      (0 until t.length).map(i => (id, i, t.substring(i)))
    }
    def lcp(a: String, b: String): Int = {
      var i = 0
      val n = math.min(math.min(a.length, b.length), maxOrder)
      while (i < n && a(i) == b(i)) i += 1
      i
    }
    val masks = all.map { case (id, p, s) =>
      val m = all.filter(o => !(o._1 == id && o._2 == p))
        .map(o => lcp(s, o._3)).max
      (id, p, m)
    }.groupBy(_._1).map { case (id, xs) =>
      val text = rows.find(_._1 == id).get._2
      val covered = new Array[Boolean](text.length)
      xs.foreach { case (_, p, m) =>
        if (m >= minLen) (p until math.min(p + m, text.length))
          .foreach(covered(_) = true)
      }
      val clean = text.zipWithIndex.filterNot(c => covered(c._2)).map(_._1).mkString
      id -> ((clean, clean.length.toLong, covered.count(identity).toLong))
    }
    rows.map { case (id, t) =>
      id -> masks.getOrElse(id, (t, t.length.toLong, 0L))
    }.toMap
  }

  test("dedupSpans: planted boilerplate is removed from every copy, survivors stitch exactly") {
    // 3 docs share a 26-char boilerplate header and 2 share a footer;
    // unique middles survive; doc 4 is all boilerplate (fully covered);
    // doc 5 has nothing repeated; doc 6 is empty
    val header = "COMMON_BOILERPLATE_HEADER:"
    val footer = "(c) same footer every time"
    val rows = Seq(
      1L -> s"${header}alpha body one$footer",
      2L -> s"${header}beta body two$footer",
      3L -> s"${header}gamma middle text here",
      4L -> header,
      5L -> "totally unique content!",
      6L -> "")
    val want = bruteClean(rows, maxOrder = 32, minLen = 20)
    val got = SuffixArray.dedupSpans(rows.toDF("doc_id", "text"),
        "doc_id", "text", maxOrder = 32, minLen = 20)
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got.keySet === rows.map(_._1).toSet)
    for ((id, w) <- want)
      assert(got(id) === w, s"doc $id: got ${got(id)}, want $w")
    // the planted shape really exercised removal: headers gone
    assert(!got(1L)._1.contains(header) && !got(2L)._1.contains(header))
    assert(got(4L)._1 === "", "fully-covered doc must come back empty")
    assert(got(5L)._1 === rows.find(_._1 == 5L).get._2, "unique doc untouched")
  }

  test("dedupSpans: overlapping and touching spans merge before stitching") {
    // 'abcdefghijklmnopqrstuvwxyz' repeated with 1-char offsets makes a
    // dense overlapping span family — the interval merge must collapse
    // them, never double-remove or split survivors
    val core = "abcdefghijklmnopqrstuvwxyz0123456789"
    val rows = Seq(
      1L -> s"XX${core}YY",
      2L -> s"PP${core}QQ${core}RR")
    val want = bruteClean(rows, maxOrder = 32, minLen = 20)
    val got = SuffixArray.dedupSpans(rows.toDF("doc_id", "text"),
        "doc_id", "text", maxOrder = 32, minLen = 20)
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    for ((id, w) <- want)
      assert(got(id) === w, s"doc $id: got ${got(id)}, want $w")
  }

  test("dedupSpans leaves no position-scale blocks cached after returning") {
    val before = sp.sparkContext.getPersistentRDDs.keySet
    val out = SuffixArray.dedupSpans(fixture.toDF("doc_id", "text"),
      "doc_id", "text", 32, 10).collect()
    assert(out.nonEmpty)
    val added = sp.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 1,
      s"dedupSpans leaked ${added.size} cached RDDs: ids $added")
  }

  test("repeatProfile leaves no position-scale blocks cached after returning") {
    // the operator persists TWO position-scale frames internally (the
    // ranged frame inside globalRankOwned and its own ord projection);
    // a finished call must release both — only the doc-count-scale
    // result may remain (the caller owns that one)
    val before = sp.sparkContext.getPersistentRDDs.keySet
    val out = run(fixture.toDF("doc_id", "text"))
    assert(out.nonEmpty)
    val added = sp.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 1,
      s"repeatProfile leaked ${added.size} cached RDDs (expected at most " +
        s"the doc-scale result): ids $added")
  }

  /** brute-force contamination witness: each eval position against
    * EVERY train suffix; coverage mask like [[bruteClean]]. */
  private def bruteContam(train: Seq[(Long, String)], eval: Seq[(Long, String)],
                          maxOrder: Int, minLen: Int)
      : Map[Long, (Long, Long, Long, Long)] = {
    def lcp(a: String, b: String): Int = {
      var i = 0
      val n = math.min(math.min(a.length, b.length), maxOrder)
      while (i < n && a(i) == b(i)) i += 1
      i
    }
    val tSfx = train.filter(r => r._2 != null && r._2.nonEmpty)
      .flatMap { case (_, t) => (0 until t.length).map(t.substring) }
    eval.filter(r => r._2 != null && r._2.nonEmpty).map { case (id, t) =>
      val ms = (0 until t.length).map { i =>
        val s = t.substring(i)
        if (tSfx.isEmpty) 0 else tSfx.map(o => lcp(s, o)).max
      }
      val covered = new Array[Boolean](t.length)
      ms.zipWithIndex.foreach { case (m, i) =>
        if (m >= minLen) (i until math.min(i + m, t.length))
          .foreach(covered(_) = true)
      }
      id -> ((t.length.toLong, ms.max.toLong,
        ms.count(_ >= minLen).toLong, covered.count(identity).toLong))
    }.toMap
  }

  private def runContam(train: Seq[(Long, String)], eval: Seq[(Long, String)],
                        maxOrder: Int = 32, minLen: Int = 20)
      : Map[Long, (Long, Long, Long, Long)] =
    SuffixArray.contamination(train.toDF("doc_id", "text"),
        eval.toDF("doc_id", "text"), "doc_id", "text", maxOrder, minLen)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap

  test("contamination matches the all-train-suffixes brute force") {
    val secret = "THE_SECRET_BENCHMARK_ANSWER_IS_42"
    val train = Seq(
      1L -> s"training text with $secret inside it",
      2L -> "other unrelated training material",
      3L -> "short")
    val eval = Seq(
      10L -> s"eval question quoting $secret verbatim",   // contaminated
      11L -> "completely novel evaluation prompt",        // clean
      12L -> s"training text with $secret inside it",     // full copy of 1
      13L -> "other unrelated tra",                       // 19-char overlap < minLen
      14L -> "zz")
    val want = bruteContam(train, eval, maxOrder = 32, minLen = 20)
    val got = runContam(train, eval)
    assert(got === want)
    assert(got(10L)._4 >= secret.length.toLong, "quoted span is covered")
    assert(got(11L)._3 === 0L && got(11L)._4 === 0L, "novel doc is clean")
    assert(got(12L)._4 === got(12L)._1, "full copy is fully covered")
    assert(got(13L)._3 === 0L, "a sub-minLen overlap never qualifies")
    assert(got(13L)._2 === 19L, "but max_match still reports it")
  }

  test("contamination: eval-on-eval duplication does NOT count") {
    val dupe = "THIS EXACT SENTENCE APPEARS IN TWO EVAL DOCS."
    val train = Seq(1L -> "train corpus with nothing shared")
    val eval = Seq(10L -> s"first: $dupe", 11L -> s"second: $dupe")
    val got = runContam(train, eval)
    val want = bruteContam(train, eval, 32, 20)
    assert(got === want)
    assert(got(10L)._3 === 0L && got(11L)._3 === 0L,
      "eval-internal duplication must not register as train contamination")
  }

  test("contamination: empty train corpus yields all-zero matches") {
    val eval = Seq(10L -> "anything at all", 11L -> "more of anything")
    val got = runContam(Seq.empty[(Long, String)], eval)
    assert(got === Map(
      10L -> ((15L, 0L, 0L, 0L)), 11L -> ((16L, 0L, 0L, 0L))))
  }

  test("contamination: spans longer than maxOrder still cover fully via chained starts") {
    // a 60-char copied block under maxOrder = 16: every position's match
    // caps at 16, but successive starts chain the coverage to the whole
    // block — the interval merge must deliver full contam_chars
    val block = (1 to 6).map(i => f"SEG$i%02d_ABCDE").mkString // 60 chars
    val train = Seq(1L -> s"lead $block trail")
    val eval = Seq(10L -> s"Q: $block?")
    val want = bruteContam(train, eval, maxOrder = 16, minLen = 10)
    val got = runContam(train, eval, maxOrder = 16, minLen = 10)
    assert(got === want)
    assert(got(10L)._4 >= block.length.toLong)
  }

  test("contamination is invariant under adversarial repartitioning") {
    val train = fixture.take(5)
    val eval = fixture.drop(5).map { case (id, t) => (id + 100L, t) }
    val a = SuffixArray.contamination(
      train.toDF("doc_id", "text").repartition(13),
      eval.toDF("doc_id", "text").repartition(7),
      "doc_id", "text", 32, 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val b = SuffixArray.contamination(
      train.toDF("doc_id", "text").repartition(1),
      eval.toDF("doc_id", "text").repartition(1),
      "doc_id", "text", 32, 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a === b)
    assert(a === bruteContam(train, eval, 32, 10)
      .map { case (id, t) => (id, t._1, t._2, t._3, t._4) }.toSet)
  }

  test("contamination leaves no position-scale blocks cached after returning") {
    val before = sp.sparkContext.getPersistentRDDs.keySet
    val out = runContam(fixture.take(5),
      fixture.drop(5).map { case (id, t) => (id + 100L, t) }, 32, 10)
    assert(out.nonEmpty)
    val added = sp.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 1,
      s"contamination leaked ${added.size} cached RDDs: ids $added")
  }

  /** brute removal witness over the cross-corpus matches: coverage mask
    * from [[bruteContam]]-style per-position maxima, stitched. */
  private def bruteDecontam(train: Seq[(Long, String)], eval: Seq[(Long, String)],
                            maxOrder: Int, minLen: Int)
      : Map[Long, (String, Long, Long)] = {
    def lcp(a: String, b: String): Int = {
      var i = 0
      val n = math.min(math.min(a.length, b.length), maxOrder)
      while (i < n && a(i) == b(i)) i += 1
      i
    }
    val tSfx = train.filter(r => r._2 != null && r._2.nonEmpty)
      .flatMap { case (_, t) => (0 until t.length).map(t.substring) }
    eval.filter(_._2 != null).map { case (id, t) =>
      val covered = new Array[Boolean](t.length)
      (0 until t.length).foreach { i =>
        val m = if (tSfx.isEmpty) 0 else tSfx.map(o => lcp(t.substring(i), o)).max
        if (m >= minLen) (i until math.min(i + m, t.length))
          .foreach(covered(_) = true)
      }
      val clean = t.zipWithIndex.filterNot(c => covered(c._2)).map(_._1).mkString
      id -> ((clean, clean.length.toLong, covered.count(identity).toLong))
    }.toMap
  }

  test("decontaminate: train-verbatim spans excised, eval-on-eval dup preserved") {
    val leaked = "THE LEAKED BENCHMARK PASSAGE EVERYONE TRAINS ON"
    val evalDup = "AN EVAL-ONLY SENTENCE SHARED BY TWO EVAL DOCS!"
    val train = Seq(1L -> s"corpus text containing $leaked mid-document",
      2L -> "other train material")
    val eval = Seq(
      10L -> s"Q: $leaked — answer?",     // contaminated: span excised
      11L -> s"first $evalDup",           // eval-on-eval dup: must SURVIVE
      12L -> s"second $evalDup",
      13L -> "perfectly clean eval text")
    val want = bruteDecontam(train, eval, 32, 20)
    val got = SuffixArray.decontaminate(train.toDF("doc_id", "text"),
        eval.toDF("doc_id", "text"), "doc_id", "text", 32, 20)
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got === want)
    assert(!got(10L)._1.contains(leaked), "leaked span must be excised")
    assert(got(11L)._1.contains(evalDup) && got(12L)._1.contains(evalDup),
      "eval-internal duplication must survive decontamination")
    assert(got(13L) === (("perfectly clean eval text", 25L, 0L)))
  }

  test("decontaminate leaves no position-scale blocks cached after returning") {
    val before = sp.sparkContext.getPersistentRDDs.keySet
    val out = SuffixArray.decontaminate(
      fixture.take(5).toDF("doc_id", "text"),
      fixture.drop(5).map { case (id, t) => (id + 100L, t) }
        .toDF("doc_id", "text"), "doc_id", "text", 32, 10).collect()
    assert(out.nonEmpty)
    val added = sp.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 1,
      s"decontaminate leaked ${added.size} cached RDDs: ids $added")
  }

  test("commonPrefixLen counts code points and handles mismatch at 0") {
    import org.apache.spark.sql.functions._
    val got = Seq(("abcd", "abxx"), ("", "abc"), ("same", "same"),
        ("a", "b"))
      .toDF("a", "b")
      .select(graft.functions.ArrayFunctions
        .commonPrefixLen(col("a"), col("b")).as("l"))
      .as[Long].collect().toSeq
    assert(got === Seq(2L, 0L, 4L, 0L))
  }
}
