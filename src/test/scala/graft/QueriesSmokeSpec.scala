package graft

/** Every registered query runs at sf0.001 and yields a stable schema;
  * the flagship entry returns rows (the driver's t1 smoke).
  */
class QueriesSmokeSpec extends SparkSpecBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared oracle has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("every registered query is documented in SURVEY.md section 2") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")))
    val undocumented = SparkEntry.queries.keySet
      .filterNot(name => survey.contains(s"`$name`"))
    assert(undocumented.isEmpty,
      s"queries missing a SURVEY section-2 row: ${undocumented.toSeq.sorted}")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  // approx-sketch error bounds live with the other sketch-bound tests
  // in SketchBoundsSpec (SpaceSavingSpec.scala)

  test("text_bigram_nll matches a driver-side add-1 bigram LM at sf0.001") {
    import spark.implicits._
    val texts = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = texts.map { case (id, t) => (id, t.split(" ", -1).toSeq) }
    val vocab = toks.flatMap(_._2).toSet.size
    val bigrams = toks.flatMap { case (id, ts) =>
      ts.zip(ts.drop(1)).map { case (a, b) => (id, a, s"$a $b") }
    }
    val c2 = bigrams.groupBy(_._3).map { case (g, xs) => (g, xs.size) }
    val c1 = bigrams.groupBy(_._2).map { case (w, xs) => (w, xs.size) }
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = bigrams.groupBy(_._1).map { case (id, xs) =>
      // replicate the engine arithmetic exactly: per-TYPE ln p rounded
      // 9 dp, quantized long sum, mean rounded 6 dp
      val q = xs.map { case (_, w1, g) =>
        math.floor(-r9(math.log((c2(g) + 1.0) / (c1(w1) + vocab))) * 1e9 + 0.5).toLong
      }.sum
      id -> ((xs.size.toLong,
        BigDecimal(q.toDouble / 1e9 / xs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = graft.text.TextAnalytics.bigramNll(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet,
      s"doc coverage diverged: ${got.keySet.size} vs ${expected.keySet.size}")
    got.foreach { case (id, v) =>
      assert(v == expected(id), s"doc $id: got $v want ${expected(id)}")
    }
    // the score separates text: not all docs identical
    assert(got.values.map(_._2).toSet.size > 1)
  }

  test("text_ngram_novelty matches a driver-side first-seen sweep at sf0.001") {
    import spark.implicits._
    val k = graft.text.TextAnalytics.NoveltyGramTokens
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= k)
    val grams = docs.flatMap { case (id, toks) =>
      toks.sliding(k).map(g => (id, g.mkString(" "))).toSeq
    }
    val first = grams.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val expected = grams.groupBy(_._1).map { case (id, xs) =>
      val novel = xs.count { case (_, g) => first(g) == id }
      id -> ((xs.length.toLong, novel.toLong))
    }
    val got = graft.text.TextAnalytics.ngramNovelty(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // both extremes exist in the synthetic corpus: some fully novel
    // docs and at least one doc dominated by already-seen fragments
    assert(got.values.exists { case (n, nov) => nov == n })
  }

  test("text_zipf_slope matches a driver-side least-squares fit at sf0.001") {
    import spark.implicits._
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q(x: Double) = math.floor(x * 1e9 + 0.5).toLong
    val texts = graft.Tables.load(spark, sf0001, "documents")
      .select($"lang", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = texts.groupBy(_._1).map { case (lang, xs) =>
      val counts = xs.flatMap(_._2.split(" ", -1))
        .groupBy(identity).map { case (w, g) => (w, g.length) }
      val ranked = counts.toSeq.sortBy { case (w, c) => (-c, w) }
        .take(graft.text.TextAnalytics.ZipfTopN).zipWithIndex
      val xy = ranked.map { case ((_, c), i) =>
        (r9(math.log((i + 1).toDouble)), r9(math.log(c.toDouble)))
      }
      val n = xy.length
      val sx = xy.map(p => q(p._1)).sum.toDouble / 1e9
      val sy = xy.map(p => q(p._2)).sum.toDouble / 1e9
      val sxx = xy.map(p => q(p._1 * p._1)).sum.toDouble / 1e9
      val sxy = xy.map(p => q(p._1 * p._2)).sum.toDouble / 1e9
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      lang -> ((n.toLong, r6(slope), r6((sy - slope * sx) / n)))
    }
    val got = graft.text.TextAnalytics.zipfSlope(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == expected)
    // natural-ish word-soup still ranks: slope is negative everywhere
    assert(got.values.forall(_._2 < 0))
  }

  test("text_tfidf matches a driver-side tf-idf ranking at sf0.001") {
    import spark.implicits._
    val texts = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = texts.length
    val tf = texts.flatMap { case (id, t) =>
      t.split(" ", -1).groupBy(identity).map { case (w, xs) => ((id, w), xs.length) }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (w, xs) => (w, xs.size) }
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = tf.toSeq
      .map { case ((id, w), f) => (id, w, r9(f * r9(math.log(n.toDouble / df(w))))) }
      .groupBy(_._1).flatMap { case (id, xs) =>
        xs.sortBy { case (_, w, s) => (-s, w) }
          .take(graft.text.TextAnalytics.TfidfTopK)
          .zipWithIndex.map { case ((_, w, s), i) => (id, i + 1L, w, s) }
      }.toSet
    val got = graft.text.TextAnalytics.tfidf(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    assert(got == expected,
      s"tf-idf diverged; sample missing: ${(expected -- got).take(3)}, " +
        s"sample extra: ${(got -- expected).take(3)}")
  }

  test("text_bpe_merges: the fold is the canonical greedy scan, not string-replace") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // (syms, a, b, expected) — [b,b,b,b] is the case replace-based
    // merges get wrong ([bb,b,b] or [bb,b,bb] depending on delimiter
    // handling; canonical BPE gives [bb,bb])
    val cases = Seq(
      (Seq("b", "b", "b", "b"), "b", "b", Seq("bb", "bb")),
      (Seq("b", "b", "b"), "b", "b", Seq("bb", "b")),
      (Seq("a", "b", "a", "b"), "a", "b", Seq("ab", "ab")),
      (Seq("a", "a", "b"), "a", "b", Seq("a", "ab")),
      (Seq("x"), "a", "b", Seq("x")),
      (Seq("c", "a"), "a", "b", Seq("c", "a")))
    val got = cases.toDF("syms", "a", "b", "expected")
      .withColumn("merged", expr(graft.text.TextAnalytics.bpeFoldExpr))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](4) == r.getSeq[String](3),
        s"fold mismatch for ${r.getSeq[String](0)}: got ${r.getSeq[String](4)}")
    }
  }

  test("text_bpe_merges: rounds are distinct pairs with non-increasing frequency") {
    val rows = graft.text.TextAnalytics.bpeMerges(spark, sf0001).collect()
    assert(rows.length == graft.text.TextAnalytics.BpeRounds)
    val freqs = rows.map(_.getLong(4))
    assert(freqs.zip(freqs.tail).forall { case (x, y) => x >= y },
      s"merge frequencies increased across rounds: ${freqs.toSeq}")
    val pairs = rows.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length == pairs.length, "duplicate merge pair")
    rows.foreach(r => assert(r.getString(3) == r.getString(1) + r.getString(2)))
  }

  test("mm_phash_dedup: re-encode noise defeats md5 but not the perceptual hash") {
    import graft.multimodal.Multimodal
    val payload = Array.tabulate(1000)(i => (i * 37 % 256).toByte)
    val noisy = Multimodal.PHash.corrupt(payload)
    assert(!java.util.Arrays.equals(payload, noisy),
      "corruption did not change the bytes — exact dedup would catch it")
    assert(Multimodal.PHash.ahash(payload) == Multimodal.PHash.ahash(noisy),
      "corruption leaked into the sampled cells — perceptual hash broke")
    val out = Multimodal.phashDedup(spark, sf0001)
      .select("doc_id", "is_dup").collect()
    val copies = out.filter(_.getLong(0) >= 40000)
    assert(copies.nonEmpty, "no planted copies")
    copies.foreach(r => assert(r.getBoolean(1),
      s"planted re-encoded copy ${r.getLong(0)} not flagged as dup"))
  }

  test("corpus_sample_priority implements Duffield–Lund–Thorup exactly") {
    import spark.implicits._
    val k = graft.text.TextAnalytics.PrioritySampleK
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 13), 16).toDouble + 1.0) /
        4503599627370496.0
    }
    val sorted = docs.map { case (id, w) => (id, w, w.toDouble / u(id)) }
      .sortBy(p => (-p._3, p._1))
    val tau = sorted(k)._3
    val expect = sorted.take(k)
      .map { case (id, w, _) => (id, math.max(w.toDouble, tau)) }.toMap
    val got = graft.text.TextAnalytics.samplePriority(spark, sf0001)
      .select($"doc_id", $"w_hat").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == expect, "distributed sample diverged from dense replay")
    // the point of the ŵ = max(w, τ) rule: Σŵ over the sample is an
    // unbiased estimator of the TOTAL weight
    val total = docs.map(_._2.toDouble).sum
    val est = got.values.sum
    info(f"subset-sum estimate $est%.0f vs true $total%.0f " +
      f"(${(est / total - 1) * 100}%+.1f%%)")
    assert(math.abs(est / total - 1) < 0.5,
      s"priority-sample subset-sum estimate $est far from true total $total")
  }

  test("corpus_temperature_mix flattens the source distribution") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val mass = docs.groupBy($"source").agg(sum($"n_chars").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val total = mass.values.sum.toDouble
    val sel = graft.text.TextAnalytics.temperatureMix(spark, sf0001)
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val nSel = sel.values.sum.toDouble
    val (smallest, largest) =
      (mass.minBy(_._2)._1, mass.maxBy(_._2)._1)
    val gainSmall = (sel.getOrElse(smallest, 0L) / nSel) / (mass(smallest) / total)
    val gainLarge = (sel.getOrElse(largest, 0L) / nSel) / (mass(largest) / total)
    info(f"share gain: smallest=$gainSmall%.2f largest=$gainLarge%.2f")
    // sqrt temperature: the smallest source's selected share must
    // exceed its mass share, the largest source's must shrink
    assert(gainSmall > 1.0,
      s"smallest source not over-sampled (gain $gainSmall)")
    assert(gainLarge < 1.0,
      s"largest source not down-sampled (gain $gainLarge)")
  }

  test("corpus_dsir enriches the target language beyond its corpus share") {
    // uses sf0.01: at sf0.001 the 50-doc corpus makes the top-50 the
    // whole corpus and the selection vacuous
    val sel = graft.text.TextAnalytics.corpusDsir(spark, "/root/testdata/sf0.01")
      .select("lang").collect().map(_.getString(0))
    val share = sel.count(_ == graft.text.TextAnalytics.DsirTargetLang)
      .toDouble / sel.length
    info(f"target-lang share of selected docs: $share%.2f (corpus ~0.46)")
    assert(share > 0.6,
      f"importance selection did not enrich the target language: $share%.2f")
  }
}
