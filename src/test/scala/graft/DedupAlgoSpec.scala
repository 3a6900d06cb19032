package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Algorithmic guarantees of the dedup core that the DuckDB oracle
  * can't exercise at verification scale: deep-component convergence
  * of the cluster closure, and the prefix filter's exactness +
  * hot-gram candidate bound.
  */
class DedupAlgoSpec extends SparkSpecBase {

  test("winnowing guarantee: any shared substring of k+w-1 chars shares a fingerprint") {
    import spark.implicits._
    // k=16, w=6 → guarantee threshold 21 chars. Two otherwise-disjoint
    // docs embed the same 21-char span at different offsets; a third
    // doc shares nothing. Deterministic synthetic text (no RNG).
    val shared = "the-common-span-here!" // exactly 21 chars
    assert(shared.length === 21)
    def filler(seed: Int, n: Int): String =
      (0 until n).map(i => ('a' + (i * seed + seed * 7) % 26).toChar).mkString
    val docs = Seq(
      (1L, filler(3, 40) + shared + filler(5, 37)),
      (2L, filler(11, 73) + shared + filler(13, 19)),
      (3L, filler(17, 120))).toDF("doc_id", "text")
    val fps = Dedup.winnowFps(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "docs sharing a k+w-1 substring must share a winnowing fingerprint")
    // selection density: fingerprints are a strict subset of grams
    assert(fps.values.forall(_.nonEmpty))
  }

  test("connectedComponents labels a diameter-12 chain correctly (no silent cap)") {
    import spark.implicits._
    // path graph 0-1-2-...-12: min-label propagation needs 12 rounds —
    // a silent iter<10 cap returns wrong labels for exactly this shape
    val docs = (0L to 12L).toDF("doc_id")
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = Dedup.connectedComponents(docs, pairs)
      .orderBy($"doc_id").collect()
    assert(got.length === 13)
    assert(got.forall(_.getLong(1) === 0L),
      s"chain not fully labeled: ${got.map(r => (r.getLong(0), r.getLong(1))).mkString(",")}")
  }

  test("connectedComponents throws (not silently wrong) when the backstop is hit") {
    import spark.implicits._
    val docs = (0L to 12L).toDF("doc_id")
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(docs, pairs, maxIters = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connectedComponents separates disjoint components") {
    import spark.implicits._
    val docs = (0L to 9L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L), (8L, 9L)).toDF("d1", "d2")
    val got = Dedup.connectedComponents(docs, pairs)
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 8L))
  }

  test("two-phase stars label the diameter-12 chain in far fewer rounds") {
    import spark.implicits._
    val docs = (0L to 12L).toDF("doc_id")
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    // 6 rounds suffice where propagation needs 12 (its throw spec above
    // pins maxIters=3 failing) — the round-count claim, pinned
    val got = Dedup.connectedComponentsTwoPhase(docs, pairs, maxIters = 6)
      .orderBy($"doc_id").collect()
    assert(got.length === 13)
    assert(got.forall(_.getLong(1) === 0L),
      s"chain not fully labeled: ${got.map(r => (r.getLong(0), r.getLong(1))).mkString(",")}")
  }

  test("two-phase stars throw at the backstop and match propagation on mixed graphs") {
    import spark.implicits._
    val docs = (0L to 12L).toDF("doc_id")
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponentsTwoPhase(docs, chain, maxIters = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))

    // disjoint components + isolated nodes + an out-of-order edge:
    // both algorithms must agree exactly
    val docs2 = (0L to 9L).toDF("doc_id")
    val pairs2 = Seq((1L, 0L), (1L, 2L), (6L, 5L), (8L, 9L)).toDF("d1", "d2")
    val a = Dedup.connectedComponents(docs2, pairs2)
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Dedup.connectedComponentsTwoPhase(docs2, pairs2)
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq, "two-phase diverges from propagation")
  }

  // ---- passage dedup ---------------------------------------------------

  test("passage anchors find an off-diagonal shared span with exact bounds") {
    import spark.implicits._
    // doc 1 holds tokens w1..w40; doc 2 embeds w6..w30 (25 tokens) at
    // position 3 — different offsets, so only the diagonal logic (not
    // raw position equality) can merge the anchors
    val t1 = (1 to 40).map(i => s"w$i").mkString(" ")
    val t2 = "x1 x2 " + (6 to 30).map(i => s"w$i").mkString(" ") + " y1 y2 y3"
    val docs = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
    val got = Dedup.passagesOn(docs, 8, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // span starts at p1=6 in doc 1, p2=3 in doc 2, length exactly 25
    assert(got.toSeq === Seq((1L, 2L, 6L, 3L, 25L)), s"got ${got.toSeq}")
    // below the threshold nothing is reported
    assert(Dedup.passagesOn(docs, 8, 26).count() === 0)
    // maximality: the run is reported once, not as nested sub-spans
    assert(got.length === 1)
  }

  // ---- prefix filter ---------------------------------------------------

  /** 30 same-bucket docs, each sharing a ubiquitous "zzzzz" run (the
    * hot 5-grams) but otherwise pairwise-distinct, plus one planted
    * near-dup pair. A naive postings join makes all C(30,2)=435
    * same-bucket pairs candidates via the hot grams alone.
    */
  private def hotGramDocs = {
    import spark.implicits._
    val base = (0 until 28).map { i =>
      // 42 chars: unique digit pairs per doc + the shared "zzzzz" run
      val u = f"$i%02d"
      (100L + i, "en", s"A${u}B${u}C${u}D${u}E${u}F${u}G${u}H${u}I${u}zzzzzJK${u}LMN")
    }
    val dupBase = "A99B99C99D99E99F99G99H99I99zzzzzJK99LMN"
    val planted = Seq(
      (900L, "en", dupBase + "PQR"),   // 42 chars, bucket 5
      (901L, "en", dupBase + "PQRst")) // 44 chars, bucket 5
    (base ++ planted).toDF("doc_id", "lang", "text")
  }

  test("prefix filter kills the hot-gram |block|^2 candidate blowup") {
    val cand = Dedup.ngramCandidates(Dedup.gramTable(hotGramDocs), 0.5)
    val n = cand.count()
    // 435 naive candidates; only pairs sharing a RARE (prefix) gram
    // survive — the planted pair plus at most a handful of accidentals
    assert(n < 30, s"prefix filter ineffective: $n candidate pairs")
    assert(cand.where(col("d1") === 900L && col("d2") === 901L).count() === 1,
      "planted near-dup pair lost by the prefix filter")
  }

  test("prefix-filtered jaccard equals the brute-force result at tau") {
    import spark.implicits._
    val docs = hotGramDocs
    val got = Dedup.ngramJaccardOn(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute force: full same-(lang,bucket) pairwise jaccard, no pruning
    val g = Dedup.gramTable(docs)
    val l = g.as("l"); val r = g.as("r")
    val brute = l.join(r,
        $"l.lang" === $"r.lang" && $"l.bucket" === $"r.bucket" &&
        $"l.doc_id" < $"r.doc_id")
      .select($"l.doc_id".as("d1"), $"r.doc_id".as("d2"),
        (size(array_intersect($"l.grams", $"r.grams")).cast("double") /
         size(array_union($"l.grams", $"r.grams")).cast("double")).as("j"))
      .where($"j" >= 0.5)
      .orderBy($"d1", $"d2")
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getDouble(2)))
    assert(got.toSeq === brute.toSeq,
      s"prefix-filtered result diverges from brute force:\n got=${got.toSeq}\n brute=${brute.toSeq}")
    assert(got.nonEmpty, "planted pair not found at all")
  }

  test("hot-band cap bounds boilerplate blowup without losing genuine near-dups") {
    import spark.implicits._
    // 40 byte-identical boilerplate docs (identical signatures → one
    // band bucket of width 40 in EVERY band → C(40,2)=780 quadratic
    // candidate pairs uncapped) + one genuine near-dup pair with
    // unique text (bucket width 2)
    val boiler = (1L to 40L).map(i =>
      (i, "the same boilerplate template page content repeated verbatim on every page"))
    val pair = Seq(
      (900L, "a genuinely unique document about distributed dataflow engines and their optimizers"),
      (901L, "a genuinely unique document about distributed dataflow engines and their optimizers plus tail"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")
    val mh = Dedup.minhashed(docs)
    val capped = Dedup.pairsFromSignaturesCapped(mh, 8)
    assert(capped.where($"d1" === 900L && $"d2" === 901L).count() === 1,
      "genuine near-dup pair lost by the band cap")
    assert(capped.where($"d1" < 900L).count() === 0,
      "boilerplate bucket leaked through the cap")
    val uncapped = Dedup.pairsFromSignaturesCapped(mh, 1000)
    assert(uncapped.count() >= 780,
      s"expected the quadratic bucket uncapped, got ${uncapped.count()}")
    // the dropped bucket is exactly what the D1 hash path collapses at
    // linear cost: all 40 docs share one content hash
    assert(docs.groupBy(md5($"text".cast("binary"))).count()
      .where($"count" === 40).count() === 1)
  }

  test("incremental gate: every revision flagged dup, every fresh doc clean") {
    import spark.implicits._
    val out = Dedup.minhashIncremental(spark, sf0001)
      .select($"doc_id", $"is_dup").collect()
    val (revs, fresh) = out.partition(_.getLong(0) < 70000)
    assert(revs.nonEmpty && fresh.nonEmpty, "batch construction broke")
    // a suffix revision keeps most shingles: the signature estimate
    // must clear the LSH threshold for every planted revision
    val missed = revs.filterNot(_.getBoolean(1))
    assert(missed.isEmpty,
      s"revisions not flagged: ${missed.map(_.getLong(0)).toSeq.sorted}")
    // md5-gibberish shares no 5-gram shingle with English text — no
    // fresh doc may flag (a flag here means the band join leaked)
    val leaked = fresh.filter(_.getBoolean(1))
    assert(leaked.isEmpty,
      s"fresh docs flagged: ${leaked.map(_.getLong(0)).toSeq.sorted}")
  }
  test("contamination ratio: interval union over repeated and adjacent anchors") {
    import spark.implicits._
    val dir = tmpDir("graft_contam_ratio")
    val ph = (1 to 8).map(i => s"p$i").mkString(" ")
    val bench = "b1 b2 b3 " + ph + " b12 b13 b14 b15 b16"        // phrase at 4..11, n=16
    val twice = "x1 " + ph + " " + (1 to 9).map(i => s"y$i").mkString(" ") +
      " " + ph + " z1"                                            // anchors p=2, p=19; n=27
    val tiled = ph + " " + ph                                     // anchors p=1, p=9; n=16
    Seq((0L, bench), (1L, twice), (2L, tiled)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.contaminationRatio(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (0L, 0L, 1L, 8L, 16L, 0.5),          // the benchmark source itself
      (1L, 0L, 2L, 16L, 27L, 0.592593),    // two DISJOINT islands: 8 + 8
      (2L, 0L, 2L, 16L, 16L, 1.0)))        // adjacent anchors merge: 9-1+8
  }

  test("overlap_sorted kernel: merge-scan intersection counts") {
    import spark.implicits._
    import graft.functions.StrFuncs.{char_grams, overlap_sorted}
    val df = Seq(("abcdefgh", "abcdefgh"), ("abcdefgh", "zzzzzzzz"),
      ("abcdefgh", "cdefghij")).toDF("a", "b")
      .select(overlap_sorted(char_grams($"a", 5, sorted = true),
        char_grams($"b", 5, sorted = true)).as("ov"))
    // "abcdefgh" has 4 distinct 5-grams; identical → 4, disjoint → 0,
    // 2-char shift shares the 2 grams cdefg, defgh
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(4L, 0L, 2L))
  }

  test("containment: planted excerpt-in-book found, symmetric Jaccard misses it") {
    import spark.implicits._
    val dir = tmpDir("graft_containment")
    val para = (1 to 30).map(i => s"tok$i").mkString(" ")
    val book = (1 to 400).map(i => s"w$i").mkString(" ") + " " + para
    val other = (1 to 40).map(i => s"q$i").mkString(" ")
    Seq((0L, "en", para), (1L, "en", book), (2L, "en", other))
      .toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.ngramContainment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the paragraph is verbatim inside the book: containment(0→1) ≈ 1
    // (boundary grams at the splice differ slightly); nothing else
    // qualifies, and in particular the REVERSE direction (book→para)
    // must not appear — that's the asymmetry
    assert(got.exists { case (d1, d2, c) => d1 == 0L && d2 == 1L && c > 0.9 },
      s"excerpt not found: ${got.toSeq}")
    assert(!got.exists { case (d1, d2, _) => d1 == 1L && d2 == 0L },
      "reverse containment leaked")
    assert(!got.exists { case (d1, d2, _) => d1 == 2L || d2 == 2L },
      "unrelated doc flagged")
    // the same pair's Jaccard is far below the D4 threshold — the
    // case the asymmetric measure exists for
    val j = Dedup.ngramJaccard(spark, dir).collect()
    assert(!j.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L),
      "jaccard unexpectedly caught the excerpt pair")
  }

  test("minhash accuracy: estimates are 1/64-quantized and overwhelmingly in the 3-sigma band") {
    val rows = graft.dedup.Dedup.minhashAccuracy(spark, sf0001).collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty, "no minhash candidate pairs at sf0.001")
    rows.foreach { case (est, exact, _) =>
      assert(est >= 0.0 && est <= 1.0 && exact >= 0.0 && exact <= 1.0)
      val slots = est * graft.dedup.Dedup.NumHashes
      assert(math.abs(slots - math.round(slots)) < 1e-6,
        s"estimate $est is not a 1/64 multiple")
    }
    val inBand = rows.count(_._3).toDouble / rows.length
    info(f"within 3-sigma: ${inBand * 100}%.1f%% of ${rows.length} pairs")
    assert(inBand >= 0.9, s"sketch error outside band too often: $inBand")
  }

  test("span excision removes every benchmark phrase and nothing else survives covered") {
    import spark.implicits._
    val k = 8
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val phrases = docs.filter(_._1 % 50 == 0).flatMap { case (_, t) =>
      val toks = t.split(" ", -1)
      if (toks.length >= k + 4)
        Some(toks.slice(toks.length / 2 - k / 2 - 1,
          toks.length / 2 - k / 2 - 1 + k).mkString(" "))
      else None
    }.toSet
    val got = graft.dedup.Dedup.spanExcise(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.nonEmpty, "no contaminated docs at sf0.001")
    val byId = docs.toMap
    got.foreach { case (id, nTok, nExc, nRem, h) =>
      val toks = byId(id).split(" ", -1)
      assert(nTok == toks.length.toLong && nRem == nTok - nExc)
      // driver-side replay: covered = union of [p, p+k-1] for every
      // anchor position whose 8-gram is a benchmark phrase
      val covered = toks.sliding(k).zipWithIndex.collect {
        case (g, i) if phrases(g.mkString(" ")) => (i + 1) to (i + k)
      }.flatten.toSet
      assert(covered.size.toLong == nExc, s"doc $id covered ${covered.size}")
      val cleaned = toks.zipWithIndex
        .collect { case (t, i) if !covered(i + 1) => t }.mkString(" ")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(cleaned.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5 == h, s"doc $id cleaned-text hash mismatch")
      // the point of the operator: no benchmark phrase survives
      val cleanedToks = cleaned.split(" ", -1)
      assert(!cleanedToks.sliding(k).exists(g => phrases(g.mkString(" "))),
        s"doc $id still contains a benchmark phrase after excision")
    }
  }

  test("hash-encoded overlap equals string overlap on every sf0.001 doc pair") {
    // the D4/D4c scorers run the pair merge scan on xxhash64-encoded
    // gram sets; this pins that the encoding changes nothing on real
    // data (a same-pair 64-bit collision is the only way it could)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val g = Dedup.gramTable(
      graft.Tables.load(spark, sf0001, "documents")
        .select("doc_id", "lang", "text"))
      .select($"doc_id", $"grams",
        array_sort(transform($"grams", x => xxhash64(x))).as("gh"))
    val a = g.select($"doc_id".as("d1"), $"grams".as("ga"), $"gh".as("ha"))
    val b = g.select($"doc_id".as("d2"), $"grams".as("gb"), $"gh".as("hb"))
    val mismatches = a.join(b, $"d1" < $"d2")
      .select($"d1", $"d2",
        graft.functions.StrFuncs.overlap_sorted($"ga", $"gb").as("os"),
        graft.functions.StrFuncs.overlap_sorted_long($"ha", $"hb").as("oh"))
      .where($"os" =!= $"oh")
      .count()
    assert(mismatches == 0L)
  }

  test("max-span: planted substring recovered exactly once, maximally, " +
      "and a differing char splits spans") {
    import spark.implicits._
    // 40-char shared substring with flanks differing at BOTH
    // boundaries in both docs → exactly ONE maximal span of exactly
    // 40 chars at the planted positions
    val s = "0123456789abcdefghijklmnopqrstuvwxyzABCD"
    assert(s.length === 40)
    // docs 3/4 share two runs separated by a single differing char
    // ('Z' vs 'Q') → TWO maximal spans, not one
    val s1 = "alpha bravo charlie delta nine"   // 30 chars
    val s2 = "golf hotel india juliet kilos!"   // 30 chars
    assert(s1.length === 30 && s2.length === 30)
    val docs = Seq(
      (1L, "LEFTFLANKX" + s + "RIGHTFLANKY"),
      (2L, "leftother" + s + "rightother"),
      (3L, "prefix" + s1 + "Z" + s2 + "endbit"),
      (4L, "other" + s1 + "Q" + s2 + "tails")).toDF("doc_id", "text")
    val got = Dedup.maxSpansOn(docs, Dedup.MaxSpanK, Dedup.MaxSpanDfCap,
        Dedup.MaxSpanMinLen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val expected = Set(
      (1L, 2L, 11L, 10L, 40L),   // the planted 40-char span, exact bounds
      (3L, 4L, 7L, 6L, 30L),     // s1: maximal run up to the split char
      (3L, 4L, 38L, 37L, 30L))   // s2: resumes after it
    assert(got === expected, s"spans diverged: $got")
  }

  test("max-span: xxhash64 anchor keys reproduce the string-keyed spans " +
      "on real data") {
    // the production kernel joins anchors on xxhash64(gram); a 64-bit
    // collision between distinct grams is the only way it could
    // diverge from the oracle's string-keyed formulation
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text")
    def spans(key: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Dedup.maxSpansKeyed(docs, Dedup.MaxSpanK, Dedup.MaxSpanDfCap,
          Dedup.MaxSpanMinLen, key)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
    assert(spans(g => org.apache.spark.sql.functions.xxhash64(g)) ===
      spans(identity))
  }
}
