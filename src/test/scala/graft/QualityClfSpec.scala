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
}
