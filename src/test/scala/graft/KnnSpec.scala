package graft

import graft.ann.Knn

/** D7b: k-means-trained IVF quality — training must earn its cost.
  * Uses sf0.01 (500 vectors): at sf0.001 the 32 cells hold ~2 vectors
  * each and recall saturates for any centroid choice.
  */
class KnnSpec extends SparkSpecBase {

  private val sf001 = "/root/testdata/sf0.01"

  private def neighbors(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.where(org.apache.spark.sql.functions.col("rank") <= 3)
      .select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("Lloyd's-trained centroids beat stride selection on recall@3") {
    val truth = neighbors(Knn.bruteTopK(spark, sf001))
    val stride = neighbors(Knn.ivfTopKWith(spark, sf001, kmeansIters = 0))
    val trained = neighbors(Knn.ivfTopKWith(spark, sf001, kmeansIters = Knn.KMeansIters))
    val strideRecall = (stride & truth).size.toDouble / truth.size
    val trainedRecall = (trained & truth).size.toDouble / truth.size
    info(f"recall@3 stride=$strideRecall%.3f trained=$trainedRecall%.3f")
    assert(trainedRecall > strideRecall,
      f"training did not improve recall: stride=$strideRecall%.3f trained=$trainedRecall%.3f")
  }

  test("multi-probe IVF recovers recall the single-cell search misses") {
    val truth = neighbors(Knn.bruteTopK(spark, sf001))
    val single = neighbors(Knn.ivfTopKWith(spark, sf001, kmeansIters = Knn.KMeansIters))
    val multi = neighbors(Knn.ivfTopKMulti(spark, sf001))
    val singleRecall = (single & truth).size.toDouble / truth.size
    val multiRecall = (multi & truth).size.toDouble / truth.size
    info(f"recall@3 single=$singleRecall%.3f multi(${Knn.MultiProbeCells})=$multiRecall%.3f")
    assert(multiRecall > singleRecall,
      f"second probe cell recovered nothing: single=$singleRecall%.3f multi=$multiRecall%.3f")
  }

  test("training converges: iterations only refine cell means (centroid count bounded)") {
    import spark.implicits._
    val vecs = graft.Tables.load(spark, sf001, "embeddings")
      .select($"vec_id", $"embedding")
    val n = Knn.trainedCentroids(vecs, Knn.KMeansIters).count()
    assert(n > 0 && n <= Knn.CentBudget, s"centroid count $n out of bounds")
  }
}
