package graft

import org.apache.spark.sql.functions._
import graft.functions.BpeFunctions
import graft.operators.Corpus

/** BPE training pinned against an independent driver-side reference:
  * same start symbols (code points within whitespace words), same
  * left-to-right merge application, same (count desc, l asc, r asc)
  * tie-break.
  */
class BpeSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  /** Reference BPE learner over an in-memory corpus. */
  private def refLearn(texts: Seq[String], k: Int): Seq[(String, String, Long)] = {
    def split(w: String): Vector[String] =
      w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          buf += a + b; i += 2
        } else { buf += syms(i); i += 1 }
      }
      buf.result()
    }
    var words: Seq[Vector[String]] = texts
      .flatMap(_.split("[ \t\n\f\r]+")).filter(_.nonEmpty).map(split)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (merges.length < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for (w <- words; i <- 0 until w.length - 1)
        counts((w(i), w(i + 1))) = counts.getOrElse((w(i), w(i + 1)), 0L) + 1
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        merges += ((a, b, c))
        words = words.map(applyMerge(_, a, b))
      }
    }
    merges.toSeq
  }

  private val corpus = Seq(
    "the cat sat on the mat",
    "the cats eat the fish",
    "that mat is flat",
    "the the the banana stand")

  test("learnBpe matches the reference learner merge-for-merge") {
    val got = Corpus.learnBpe(corpus.toDF("text"), "text", numMerges = 10)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map { case (_, l, r, c) => (l, r, c) }.toSeq
    assert(got === refLearn(corpus, 10))
  }

  test("bpeSymbols applies merges within words only; boundaries never merge") {
    val merges = Array(("t", "h"), ("th", "e"))
    val syms = Seq("the thermos, the").toDF("text")
      .select(BpeFunctions.bpeSymbols(col("text"), merges).as("s"))
      .as[Seq[String]].head()
    assert(syms === Seq("the", "the", "r", "m", "o", "s", ",", "the"))
  }

  test("bpePairs under no merges = adjacent code points within words") {
    val pairs = Seq("ab cd").toDF("text")
      .select(explode(BpeFunctions.bpePairs(col("text"),
        Array.empty[(String, String)])).as("p"))
      .select(col("p.l"), col("p.r")).as[(String, String)].collect().toSeq
    assert(pairs === Seq(("a", "b"), ("c", "d"))) // no ("b", "c") across the space
  }

  test("learnBpe stops early when the corpus is fully merged") {
    val tiny = Seq("aa aa", "aa").toDF("text")
    val got = Corpus.learnBpe(tiny, "text", numMerges = 50).count()
    assert(got < 50) // "aa" collapses after one merge; no infinite loop
  }

  test("bpeStats: zero merges = non-ws code points; more merges never increase counts") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val zero = Corpus.bpeStats(docs, "doc_id", "text", Array.empty)
      .select("id", "n_subwords", "n_chars").as[(Long, Long, Long)].collect()
    // with no merges every non-whitespace code point is its own subword
    assert(zero.forall { case (_, subs, chars) => subs === chars })
    val merges = Corpus.learnBpeCached("bpespec", docs, "text", 6)
    val six = Corpus.bpeStats(docs, "doc_id", "text", merges)
      .select("id", "n_subwords").as[(Long, Long)].collect().toMap
    val zeroMap = zero.map(r => r._1 -> r._2).toMap
    assert(six.forall { case (id, n) => n <= zeroMap(id) })
    assert(six.values.sum < zeroMap.values.sum) // the merges actually fired
    // cached learner returns the identical table without retraining
    assert(Corpus.learnBpeCached("bpespec", docs, "text", 6) eq merges)
  }

  test("q102 tokenizes the fixture under the pinned merge table; ratio >= 1 everywhere") {
    val st = SparkEntry.q102(spark, sf0001)
      .select("id", "n_subwords", "n_chars", "chars_per_subword")
      .as[(Long, Long, Long, Double)].collect()
    assert(st.length === 500)
    // merged subwords can only span >= 1 char each
    assert(st.forall { case (_, subs, chars, ratio) =>
      subs <= chars && ratio >= 1.0 })
    assert(st.exists(_._4 > 1.0)) // the pinned merges compress somewhere
  }

  test("q102's pinned chain merges exactly as the sentinel-replace oracle predicts") {
    // hand-applied: table →(t,a)(ta,b)(l,e)(tab,le)→ [table] = 1;
    // part →(a,r)(p,ar)→ [par, t] = 2; scan →(s,c)(a,n)→ [sc, an] = 2;
    // value has no adjacent merge pair → 5 single-char symbols
    val df = Seq((1L, "table part scan value")).toDF("doc_id", "text")
    val got = Corpus.bpeStats(df, "doc_id", "text",
        Array(("t", "a"), ("ta", "b"), ("l", "e"), ("tab", "le"),
          ("a", "r"), ("p", "ar"), ("s", "c"), ("a", "n")))
      .select("n_subwords", "n_chars").as[(Long, Long)].head()
    assert(got === ((1L + 2L + 2L + 5L, 18L)))
  }

  test("q99 runs on the fixture and learns frequent merges first") {
    val m = SparkEntry.q99(spark, sf0001)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
    assert(m.length === 12)
    // counts are non-increasing-ish is NOT guaranteed (later merges can
    // create new frequent pairs), but every chosen count is positive and
    // ranks are dense
    assert(m.forall(_._4 > 0))
    assert(m.map(_._1).toSeq === (1 to 12))
  }
}
