package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.EventOps
import graft.operators.Dedup
import graft.sinks.PartitionedSink

/** ScalaCheck-generator property specs (SURVEY §5.4): invariants that
  * must hold for arbitrary inputs, not just fixtures. Generators are
  * sampled with fixed seeds (deterministic CI) via scalacheck directly —
  * the scalatest bridge artifact is not on the offline classpath.
  */
class PropertySpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def samples[A](gen: Gen[A], n: Int = 12): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: both BPE tiers ≡ the sequential reference on arbitrary small-alphabet corpora") {
    // small alphabets maximize merge interaction (chained tops, concat
    // collisions, (a,a) self-merges appear constantly) — the hardest
    // regime for the certified-batch proof and the incremental trainer
    val corpusGen = for {
      nDocs <- Gen.choose(3, 10)
      docs <- Gen.listOfN(nDocs, Gen.nonEmptyListOf(
        Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.take(6).mkString))
        .map(_.take(8).mkString(" ")))
    } yield docs
    def refLearn(texts: Seq[String], k: Int): Seq[(String, String, Long)] = {
      def split(w: String) = w.toVector.map(_.toString)
      def applyMerge(syms: Vector[String], a: String, b: String) = {
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            buf += a + b; i += 2
          } else { buf += syms(i); i += 1 }
        }
        buf.result()
      }
      var words = texts.flatMap(_.split("[ \t\n\f\r]+")).filter(_.nonEmpty).map(split)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var done = false
      while (out.length < k && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for (w <- words; i <- 0 until w.length - 1)
          counts((w(i), w(i + 1))) = counts.getOrElse((w(i), w(i + 1)), 0L) + 1
        if (counts.isEmpty) done = true
        else {
          val ((a, b), c) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
          out += ((a, b, c))
          words = words.map(applyMerge(_, a, b))
        }
      }
      out.toSeq
    }
    samples(corpusGen, 10).foreach { docs =>
      val want = refLearn(docs, 18)
      for (dictMax <- Seq(0L, graft.operators.Corpus.BpeLocalDictMax)) {
        val got = graft.operators.Corpus
          .learnBpe(docs.toDF("text"), "text", 18, localDictMax = dictMax)
          .orderBy("rank").as[(Int, String, String, Long)].collect()
          .map { case (_, l, r, c) => (l, r, c) }.toSeq
        assert(got === want,
          s"tier dictMax=$dictMax diverged on corpus: ${docs.mkString(" | ")}")
      }
    }
  }

  test("property: normalize is idempotent and whitespace-insensitive") {
    val wsGen = Gen.listOf(Gen.oneOf(" ", "\t", "\n", "  ")).map(_.mkString)
    val wordGen = Gen.listOfN(3, Gen.alphaNumStr.map(_.take(6)))
    val strGen = for { ws1 <- wsGen; ws2 <- wsGen; w <- wordGen }
      yield ws1 + w.mkString(" ") + ws2
    samples(Gen.listOfN(15, strGen)).foreach { texts =>
      val df = texts.toDF("text")
      val once = df.select(graft.functions.TextFunctions.normalize(col("text")).as("n"))
      val twice = once.select(graft.functions.TextFunctions.normalize(col("n")).as("n"))
      assert(once.as[String].collect().toSeq === twice.as[String].collect().toSeq)
      // collapsing interior runs == single-space join of the tokens
      val viaTokens = df.select(
        lower(concat_ws(" ", graft.functions.TextFunctions.tokens(col("text")))).as("n"))
      assert(once.as[String].collect().toSeq === viaTokens.as[String].collect().toSeq)
    }
  }

  test("property: Y4M encode -> parse round-trips arbitrary constant-luma streams") {
    val lumaGen = Gen.nonEmptyListOf(Gen.choose(0, 255)).map(_.take(8))
    val dimGen = Gen.choose(1, 12)
    val caseGen = for { w <- dimGen; h <- dimGen; ls <- lumaGen } yield (w, h, ls)
    samples(caseGen, n = 20).foreach { case (w, h, lumas) =>
      val payload = graft.multimodal.Multimodal.renderY4m(w, h, lumas.toArray)
      val media = Seq((1L, payload)).toDF("media_id", "payload")
      val meta = graft.multimodal.Multimodal.videoMeta(
        graft.multimodal.Multimodal.asMediaTable(media, "media_id", "payload", "video"))
        .collect().head
      assert(meta.decoded && meta.width === w && meta.height === h)
      assert(meta.n_frames === lumas.length)
      assert(meta.min_luma === lumas.min && meta.max_luma === lumas.max)
      assert(math.abs(meta.mean_luma - lumas.map(_.toDouble).sum / lumas.length) < 1e-9)
    }
  }

  test("property: packSequences partitions every token stream exactly, any budget/bucketWidth") {
    val caseGen = for {
      n <- Gen.choose(1, 120)
      budget <- Gen.choose(1L, 200L)
      bw <- Gen.choose(1L, 64L)
      toks <- Gen.listOfN(n, Gen.choose(0L, 50L))
    } yield (budget, bw, toks)
    samples(caseGen, n = 10).foreach { case (budget, bw, toks) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "n")
      val got = graft.operators.Corpus.packSequences(df, "id", col("n"), budget, bw)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      // every doc present exactly once, offsets are the exclusive cumsum,
      // bins are the offset div budget — regardless of budget/bucketWidth
      assert(got.map(_._1) === (0L until toks.size.toLong))
      val offs = toks.scanLeft(0L)(_ + _).init
      assert(got.map(_._3) === offs)
      assert(got.map(_._4) === offs.map(_ / budget))
    }
  }

  test("property: chunk covers every token exactly once at stride == size, for any doc mix") {
    val caseGen = for {
      size <- Gen.choose(1L, 40L)
      ns <- Gen.nonEmptyListOf(Gen.choose(0L, 300L)).map(_.take(30))
    } yield (size, ns)
    samples(caseGen, n = 10).foreach { case (size, ns) =>
      val df = ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "n")
      val got = graft.operators.Corpus.chunk(df, "id", col("n"), size, size)
        .as[(Long, Long, Long)].collect().toSeq
      val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      ns.zipWithIndex.foreach { case (n, i) =>
        assert(byDoc.getOrElse(i.toLong, 0L) === n, s"doc $i lost tokens")
      }
      // no chunk exceeds the window and only tail chunks are short
      got.groupBy(_._1).values.foreach { chunks =>
        val sorted = chunks.sortBy(_._2)
        assert(sorted.forall(_._3 <= size))
        assert(sorted.init.forall(_._3 === size), "only the tail chunk may be short")
      }
    }
  }

  test("property: splitAssign is total and deterministic for arbitrary ids/salts") {
    val caseGen = for {
      salt <- Gen.alphaNumStr.map(_.take(8))
      ids <- Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue)).map(_.distinct.take(50))
    } yield (salt, ids)
    samples(caseGen, n = 8).foreach { case (salt, ids) =>
      val df = ids.toDF("id")
      val a = graft.operators.Corpus.splitAssign(df, "id", salt)
        .as[(Long, String)].collect().toMap
      assert(a.keySet === ids.toSet)
      assert(a.values.forall(Set("train", "val", "test")))
      val b = graft.operators.Corpus.splitAssign(df.repartition(7), "id", salt)
        .as[(Long, String)].collect().toMap
      assert(a === b)
    }
  }

  test("property: ntileExact == ntile for arbitrary duplicates, sizes, k, partitionings") {
    val caseGen = for {
      n <- Gen.choose(1, 400)
      dupes <- Gen.choose(1, 10) // low cardinality forces heavy ties
      k <- Gen.choose(1, 7)
      parts <- Gen.choose(1, 9)
    } yield (n, dupes, k, parts)
    samples(caseGen, n = 15).foreach { case (n, dupes, k, parts) =>
      val df = (1 to n).map(i => (i.toLong, (i % dupes).toDouble))
        .toDF("id", "v").repartition(parts)
      val order = Seq(col("v").desc, col("id").asc)
      val got = graft.operators.Ranks.ntileExact(df, order, k, outCol = "b")
        .select("id", "b").as[(Long, Long)].collect().toMap
      val want = df.withColumn("b",
          ntile(k).over(org.apache.spark.sql.expressions.Window.orderBy(order: _*)).cast("long"))
        .select("id", "b").as[(Long, Long)].collect().toMap
      assert(got === want, s"diverged at n=$n dupes=$dupes k=$k parts=$parts")
    }
  }

  test("property: quantileScan == percentile for arbitrary values, duplicates, p, params") {
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val valGen = Gen.oneOf(
      Gen.choose(-1000.0, 1000.0),
      Gen.oneOf(0.0, 1.0, -1.0, 5.5, 1e6)) // duplicate mass
    val grpGen = Gen.oneOf("a", "b", "c")
    val rowGen = for { g <- grpGen; v <- valGen } yield (g, v)
    val caseGen = for {
      rows <- Gen.listOfN(60, rowGen).suchThat(_.nonEmpty)
      p <- Gen.oneOf(0.0, 0.1, 0.5, 0.77, 1.0)
      bins <- Gen.oneOf(2, 4, 16)
      lim <- Gen.oneOf(1, 3, 8)
    } yield (rows, p, bins, lim)
    samples(caseGen, n = 8).foreach { case (rows, p, bins, lim) =>
      val df = rows.toDF("g", "v")
      val want = df.groupBy(col("g")).agg(expr(s"percentile(v, $p)").as("q"))
        .as[(String, Double)].collect().toMap.view.mapValues(r6).toMap
      val got = graft.operators.Quantiles
        .quantileScan(df, "g", "v", p, bins = bins, collectLimit = lim)
        .select(col("g"), col("q")).as[(String, Double)].collect().toMap
        .view.mapValues(r6).toMap
      assert(got === want, s"p=$p bins=$bins lim=$lim")
    }
  }

  test("property: setSimJoinPrefix == brute force for arbitrary small corpora/thresholds") {
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val docGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))
    val caseGen = for {
      texts <- Gen.listOfN(14, docGen)
      (num, den) <- Gen.oneOf((1, 2), (7, 10), (1, 3), (1, 1))
    } yield (texts, num, den)
    samples(caseGen, n = 6).foreach { case (texts, num, den) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.setSimJoinPrefix(df, "doc_id", "text", num, den)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      // independent brute force on the raw texts
      val sh = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split("\\s+").filter(_.nonEmpty)
          .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }
      val want = (for {
        i <- sh.indices.iterator
        j <- (i + 1) until sh.length
        inter = (sh(i)._2 & sh(j)._2).size
        un = sh(i)._2.size + sh(j)._2.size - inter
        if un > 0 && inter * den >= un * num
      } yield (sh(i)._1, sh(j)._1)).toSet
      assert(got === want, s"t=$num/$den texts=$texts")
    }
  }

  test("property: epoch-ms -> TimestampType -> epoch-ms roundtrips") {
    samples(Gen.listOfN(20, Gen.choose(0L, 4102444800000L))).foreach { ms =>
      val out = EventOps.deriveEventTime(ms.toDF("timestamp"), "timestamp", "ts")
        .select(unix_millis(col("ts"))).as[Long].collect().toList
      assert(out === ms)
    }
  }

  test("property: exactDedup is a fixpoint, keeps min id per key") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 1000L), Gen.oneOf("a", "b", "c", "d")))
    samples(gen).foreach { rows =>
      val df = rows.toDF("id", "key")
      val once = Dedup.exactDedup(df, Seq("key"), "id")
      val twice = Dedup.exactDedup(once, Seq("key"), "id")
      val a = once.as[(Long, String)].collect().sortBy(identity).toList
      val b = twice.as[(Long, String)].collect().sortBy(identity).toList
      assert(a === b)                              // fixpoint
      assert(a.map(_._2).distinct.size === a.size) // one row per key
      val minPerKey = rows.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
      assert(a.forall { case (id, k) => id == minPerKey(k) })
    }
  }

  test("property: union-append preserves multiplicity (O19)") {
    val gen = Gen.zip(Gen.listOfN(30, Gen.choose(0L, 50L)), Gen.listOfN(30, Gen.choose(0L, 50L)))
    samples(gen, 6).foreach { case (xs, ys) =>
      assert(EventOps.append(xs.toDF("v"), ys.toDF("v")).count() === xs.size + ys.size)
    }
  }

  test("property: partitioned write -> read-back equals input") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 999L),
      Gen.oneOf("e1", "e2"), Gen.choose(2020, 2025), Gen.choose(1, 12)))
    samples(gen, 4).foreach { rows =>
      val dir = Files.createTempDirectory("graft_prop_").toString
      PartitionedSink.appendPartitioned(rows.toDF("id", "entity", "year", "month"), dir)
      val back = sp.read.parquet(dir)
        .select("id", "entity", "year", "month")
        .as[(Long, String, Int, Int)].collect().sortBy(identity).toList
      assert(back === rows.sortBy(identity))
    }
  }

  test("property: minhash signature match-rate estimates jaccard within 0.2") {
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(0, 200)).map(_.distinct.map(i => s"g$i")),
      Gen.nonEmptyListOf(Gen.choose(0, 200)).map(_.distinct.map(i => s"g$i")))
    samples(gen, 8).foreach { case (a, b) =>
      val inter = a.toSet.intersect(b.toSet).size
      val truth = inter.toDouble / (a.size + b.size - inter)
      val sigs = Seq(("a", a), ("b", b)).toDF("id", "sh")
        .select(col("id"),
          graft.functions.HashFunctions.minhashSignature(col("sh"), 256).as("sig"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val est = sigs("a").zip(sigs("b")).count { case (x, y) => x == y } / 256.0
      assert(math.abs(est - truth) < 0.2,
        s"estimate $est vs true $truth for |a|=${a.size} |b|=${b.size}")
    }
  }

  test("property: snapshot diff statuses partition the key space; self-diff is unchanged") {
    val rowGen = for {
      id <- Gen.choose(0L, 30L); v <- Gen.choose(0, 5)
    } yield (id, v.toDouble)
    val tableGen = Gen.listOfN(20, rowGen)
      .map(_.groupBy(_._1).map(_._2.head).toSeq) // unique keys per snapshot
    samples(Gen.zip(tableGen, tableGen), 8).foreach { case (a, b) =>
      val old = a.toDF("id", "v"); val neu = b.toDF("id", "v")
      val st = graft.operators.Snapshot.diff(old, neu, Seq("id"), Seq("v"))
        .select("id", "status").as[(Long, String)].collect().toMap
      // every key of either side appears exactly once, with the right class
      val (ka, kb) = (a.map(_._1).toSet, b.map(_._1).toSet)
      assert(st.keySet === (ka ++ kb))
      assert((ka -- kb).forall(st(_) == "removed"))
      assert((kb -- ka).forall(st(_) == "added"))
      val (ma, mb) = (a.toMap, b.toMap)
      (ka & kb).foreach { k =>
        assert(st(k) === (if (ma(k) == mb(k)) "unchanged" else "changed"))
      }
      // self-diff: all unchanged, changes() empty
      assert(graft.operators.Snapshot.changes(old, old, Seq("id"), Seq("v"))
        .count() === 0)
    }
  }

  test("property: winsorize clamps into the cutoff band and fixes interior rows") {
    val valsGen = Gen.nonEmptyListOf(Gen.choose(-1000.0, 1000.0)).map(_.take(40))
    samples(valsGen, 8).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
        .toDF("id", "grp", "value")
      val got = graft.operators.Corpus.winsorize(df, "grp", "value", 0.1, 0.9,
          outCol = "w")
        .select("value", "w").as[(Double, Double)].collect()
      val lo = got.map(_._2).min; val hi = got.map(_._2).max
      assert(got.forall { case (_, w) => w >= lo && w <= hi })
      // rows strictly inside the band are untouched
      assert(got.filter { case (v, _) => v > lo && v < hi }
        .forall { case (v, w) => w === math.rint(v * 1e6) / 1e6 || w === v ||
          math.abs(w - v) < 5e-7 }) // output rounds to 6 places
      // clamping is monotone: order of values is preserved weakly
      val sorted = got.sortBy(_._1).map(_._2)
      assert(sorted.zip(sorted.tail).forall { case (x, y) => x <= y })
    }
  }

  test("property: scalarQuantize codes are bounded and order-preserving per dim") {
    val vecGen = Gen.listOfN(4, Gen.choose(-100.0f, 100.0f))
    samples(Gen.listOfN(20, vecGen), 6).foreach { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
      val got = graft.operators.Quantize.scalarQuantize(df, "id", "vec")
        .as[(Long, Int, Long)].collect()
      assert(got.forall { case (_, _, c) => c >= 0L && c <= 255L })
      // within a dimension, a larger value never gets a smaller code
      for (p <- 0 until 4) {
        val dim = got.filter(_._2 == p).map { case (id, _, c) =>
          (vecs(id.toInt)(p), c) }.sortBy(_._1)
        assert(dim.zip(dim.tail).forall { case ((_, c1), (_, c2)) => c1 <= c2 },
          s"codes not monotone in dim $p")
      }
    }
  }

  test("property: repeatedWindows equals brute force on random repetitive corpora") {
    val phraseGen = Gen.oneOf("sharedalphaphrase", "otherbetachunk", "gammagammagamma")
    val docGen = for {
      pre <- Gen.alphaLowerStr.map(_.take(6))
      ph <- phraseGen
      post <- Gen.alphaLowerStr.map(_.take(6))
    } yield pre + ph + post
    samples(Gen.listOfN(8, docGen), 6).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val width = 10
      val got = graft.operators.Dedup.repeatedWindows(docs, "doc_id", "text",
          width = width, minDocs = 2)
        .as[(String, Long)].collect().toMap
      val brute = texts.zipWithIndex.flatMap { case (t, i) =>
          (0 to t.length - width).map(o => (t.substring(o, o + width), i.toLong))
        }.distinct.groupBy(_._1).view.mapValues(_.size.toLong)
        .filter(_._2 >= 2).toMap
      assert(got === brute)
    }
  }

  test("property: bloom has NO false negatives for arbitrary key sets and sizes") {
    import graft.functions.BloomBits
    val caseGen = for {
      numLongs <- Gen.choose(1, 64)
      k <- Gen.choose(1, 8)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
      keys <- Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)).map(_.take(200))
    } yield (numLongs, k, seed, keys)
    samples(caseGen, 20).foreach { case (numLongs, k, seed, keys) =>
      val bits = new Array[Long](numLongs)
      keys.foreach(BloomBits.add(bits, k, seed, _))
      assert(keys.forall(BloomBits.contains(bits, k, seed, _)),
        s"false negative at numLongs=$numLongs k=$k seed=$seed")
    }
  }

  test("property: pruneHighDfTokens matches a driver-side reference on random corpora") {
    val wordGen = Gen.oneOf("a", "b", "c", "dd", "ee", "ff", "g1", "g2")
    val docGen = Gen.listOf(wordGen).map(_.take(12).mkString(" "))
    val caseGen = for {
      pct <- Gen.choose(1, 99)
      docs <- Gen.nonEmptyListOf(docGen).map(_.take(20))
    } yield (pct, docs)
    samples(caseGen, 10).foreach { case (pct, texts) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.operators.Corpus.pruneHighDfTokens(df, "doc_id", "text", pct)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      val toks = texts.map(_.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq)
      val nDocs = texts.length
      val stop = toks.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size)
        .filter { case (_, dfc) => dfc * 100 > nDocs.toLong * pct }.keySet
      val want = toks.zipWithIndex.map { case (tk, i) =>
        val kept = tk.filterNot(stop)
        (i.toLong, tk.length.toLong, kept.length.toLong, kept.mkString(" "))
      }
      assert(got === want, s"pct=$pct texts=$texts")
    }
  }

  test("property: incrementalNearDup == brute-force cross jaccard on random corpora") {
    // small vocab forces real overlap; duplicates planted by reuse
    val docGen = Gen.listOfN(8, Gen.oneOf("w1", "w2", "w3", "w4", "w5")).map(_.mkString(" "))
    val caseGen = for {
      corpus <- Gen.listOfN(12, docGen)
      batch <- Gen.listOfN(6, Gen.oneOf(docGen, Gen.oneOf(corpus)))
    } yield (corpus, batch)
    samples(caseGen, 8).foreach { case (corpusTexts, batchTexts) =>
      val corpus = corpusTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = batchTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("doc_id", "text")
      val got = Dedup.incrementalNearDup(batch, corpus, "doc_id", "text")
        .select("new_id", "old_id").as[(Long, Long)].collect().toSet
      def sh(t: String): Set[Seq[String]] = {
        val tk = t.split(" ").toSeq
        if (tk.length < 3) Set.empty else tk.sliding(3).map(_.toSeq).toSet
      }
      val want = (for {
        (bt, bi) <- batchTexts.zipWithIndex; (ct, ci) <- corpusTexts.zipWithIndex
        sa = sh(bt); sb = sh(ct)
        inter = (sa & sb).size; un = sa.size + sb.size - inter
        if un > 0 && inter * 10 >= un * 7
      } yield (100L + bi, ci.toLong)).toSet
      assert(got === want, s"batch=$batchTexts corpus=$corpusTexts")
    }
  }

  test("property: selfBleu2 matches the pairwise-max witness on arbitrary tiny corpora") {
    val docGen = Gen.listOfN(8, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))
    samples(Gen.listOfN(6, docGen), 8).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Corpus.selfBleu2(df, "doc_id", "text")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      def bg(t: String): Map[String, Int] = t.split(" ").sliding(2)
        .map(_.mkString(" ")).toSeq.groupBy(identity)
        .view.mapValues(_.size).toMap
      val all = texts.zipWithIndex.map { case (t, i) => i.toLong -> bg(t) }
      all.foreach { case (id, counts) =>
        val total = counts.values.sum.toLong
        val clipped = counts.map { case (g, c) =>
          val others = all.filter(_._1 != id).map(_._2.getOrElse(g, 0)).max
          math.min(c, others).toLong
        }.sum
        assert(got(id) === ((total, clipped)), s"doc $id in $texts")
      }
    }
  }

  test("property: mcnemarGate — swapping the filters negates z; counts partition n") {
    val rowGen = for {
      g <- Gen.oneOf("x", "y"); a <- Gen.oneOf(true, false)
      b <- Gen.oneOf(true, false)
    } yield (g, a, b)
    samples(Gen.listOfN(40, rowGen), 8).foreach { rows =>
      val df = rows.toDF("grp0", "a", "b")
      val ab = graft.operators.Eval.mcnemarGate(df, "grp0", col("a"), col("b"))
        .as[(String, Long, Long, Long, Long, Long, Double, Boolean)]
        .collect().map(r => r._1 -> r).toMap
      val ba = graft.operators.Eval.mcnemarGate(df, "grp0", col("b"), col("a"))
        .as[(String, Long, Long, Long, Long, Long, Double, Boolean)]
        .collect().map(r => r._1 -> r).toMap
      ab.foreach { case (g, r) =>
        assert(ba(g)._7 === -r._7 && ba(g)._8 === r._8, s"swap must negate z for $g")
        assert(ba(g)._5 === r._6 && ba(g)._6 === r._5)
        val n = rows.count(_._1 == g)
        assert(r._2 === n.toLong)
        // discordant counts are bounded by the pass counts
        assert(r._5 <= r._3 && r._6 <= r._4)
      }
    }
  }

  test("property: pairEvidence shingles occur in BOTH pair members, ranks dense from 1") {
    // near-dup-heavy generator: few distinct templates so pairs exist
    val tmplGen = Gen.oneOf(
      "p q r s t u v w", "p q r s t u v x", "m n o k l j h g")
    samples(Gen.listOfN(5, tmplGen), 6).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup.pairEvidence(df, "doc_id", "text", k = 5)
        .as[(Long, Long, Long, String, Long)].collect()
      def sh(t: String): Set[String] =
        t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val byId = texts.zipWithIndex.map { case (t, i) => i.toLong -> sh(t) }.toMap
      got.foreach { case (a, b, _, g, df0) =>
        assert(byId(a).contains(g) && byId(b).contains(g),
          s"evidence '$g' must be in both $a and $b")
        assert(df0 === byId.values.count(_.contains(g)).toLong)
      }
      got.groupBy(r => (r._1, r._2)).foreach { case (pair, rs) =>
        assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq,
          s"ranks must be dense from 1 for $pair")
      }
    }
  }

  test("property: modePerKey's winner count equals the true max count") {
    val rowGen = for {
      k <- Gen.choose(0L, 5L); v <- Gen.oneOf("a", "b", "c", "d")
    } yield (k, v)
    samples(Gen.listOfN(60, rowGen), 8).foreach { rows =>
      val got = graft.operators.TopK.modePerKey(
          rows.toDF("k", "v"), Seq("k"), "v")
        .as[(Long, String, Long)].collect()
      val truth = rows.groupBy(_._1).map { case (k, g) =>
        val counts = g.groupBy(_._2).view.mapValues(_.size).toMap
        val maxN = counts.values.max
        // spec'd tie-break: greatest value among max-count values
        k -> ((counts.filter(_._2 == maxN).keys.max, maxN.toLong))
      }
      assert(got.map(r => r._1 -> ((r._2, r._3))).toMap === truth)
    }
  }
}
