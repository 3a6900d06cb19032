// (eval additions at the end of this suite)
package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalytics

/** D9h hashed-feature quality classifier: on a planted corpus with
  * unambiguous good (stopword-rich prose) and junk (hash gibberish)
  * documents, the NB-weighted dot product must actually SEPARATE the
  * classes — not merely replay the weak labels' arithmetic.
  */
class QualityClfSpec extends SparkSpecBase {

  test("planted good/junk docs separate by score and prediction") {
    import spark.implicits._
    val dir = tmpDir("graft_clf")
    val good = (0 until 30).map { i =>
      (i.toLong,
        s"the quick brown fox of item $i jumps over the lazy dog and " +
          "the cat sits on a mat of straw and the bird sings a song of " +
          "summer while the sun shines over the hills and a river runs")
    }
    val junk = (0 until 30).map { i =>
      // 8 md5-gibberish tokens: under the D9 rule's n_tokens >= 10
      // gate these label drop, and the hashed features are disjoint
      // from the good docs'
      (100L + i,
        (0 until 8).map(j => java.security.MessageDigest.getInstance("MD5")
          .digest(s"junk:$i:$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString).mkString(" "))
    }
    (good ++ junk).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length($"text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = TextAnalytics.qualityClf(spark, dir).collect()
    assert(out.length == 60)
    val (g, j) = out.partition(_.getLong(0) < 100)
    val gScores = g.map(_.getDouble(3))
    val jScores = j.map(_.getDouble(3))
    assert(gScores.min > jScores.max,
      s"classes overlap: good ∈ [${gScores.min}, ${gScores.max}], " +
        s"junk ∈ [${jScores.min}, ${jScores.max}]")
    // predictions agree with the planted classes
    assert(g.forall(_.getBoolean(4)), "a good doc predicted drop")
    assert(j.forall(r => !r.getBoolean(4)), "a junk doc predicted keep")
    // and with the weak labels the weights were trained against
    assert(out.forall(r => r.getBoolean(1) == r.getBoolean(4)),
      "prediction diverges from training label on a separable corpus")
  }

  test("clf eval metrics reconcile with a driver-side confusion recount") {
    val preds = graft.text.TextAnalytics.qualityClf(spark, sf0001).collect()
      .map(r => (r.getBoolean(1), r.getBoolean(4)))
    val tp = preds.count(p => p._1 && p._2).toLong
    val fp = preds.count(p => !p._1 && p._2).toLong
    val fn = preds.count(p => p._1 && !p._2).toLong
    val tn = preds.count(p => !p._1 && !p._2).toLong
    val row = graft.text.TextAnalytics.clfEval(spark, sf0001).collect().head
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)) ==
      ((tp, fp, fn, tn)))
    assert(row.getLong(0) == preds.length.toLong)
    // metrics internally consistent: F1 is the harmonic mean of P and R
    val (p, r, f1) = (row.getDouble(6), row.getDouble(7), row.getDouble(8))
    if (p + r > 0) assert(math.abs(f1 - 2 * p * r / (p + r)) < 1e-5)
  }

  test("langid eval: per-language counts reconcile and F1 is bounded by P, R") {
    val li = graft.text.TextAnalytics.langId(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val rows = graft.text.TextAnalytics.langIdEval(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.map(_._2).sum == li.length.toLong)
    rows.foreach { case (lang, nAct, nPred, tp, p, r, f1) =>
      assert(nAct == li.count(_._1 == lang).toLong)
      assert(nPred == li.count(_._2 == lang).toLong)
      assert(tp == li.count(x => x._1 == lang && x._2 == lang).toLong)
      assert(f1 <= math.max(p, r) + 1e-9 && f1 >= 0.0)
    }
  }
}
