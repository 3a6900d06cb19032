package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.load

/** D27: distributed PCA by power iteration (`emb_pca`) — the
  * dimensionality-reduction / whitening step an embedding pipeline
  * runs before building an ANN index (project 64-dim vectors onto the
  * leading principal components; small PCs are mostly noise).
  *
  * The 100 TB shape: the ONLY corpus-sized work is the covariance
  * aggregation — one (i, j) pair-explode feeding a combine-heavy
  * decimal-sum aggregate, shuffling ≤ D² = 4096 groups regardless of
  * corpus size. Everything after (power iteration on the D×D matrix)
  * is constant-size: iterations are joins between a 4096-row frame
  * and a 64-row vector, the corpus is never touched again. The
  * covariance frame feeds all [[Iters]] iterations → materialized
  * once (without it, each iteration's lineage would re-run the
  * corpus aggregation — the same staging-table policy as the
  * residual-PQ index build).
  *
  * Derandomization: the iterate starts from the all-ones direction
  * and every sum is order-free — corpus-sized passes (mean,
  * covariance, scores) quantize each term to an exact integer via
  * [[qsum]] and sum as LONG (codegen-primitive, zero cross-engine
  * tie window); the constant-size iteration frames use the 9-dp
  * decimal pattern — so the DuckDB oracle replays centering,
  * covariance, all iterations, and the final Rayleigh quotient
  * bit-for-bit. Power
  * iteration's Rayleigh quotient is monotone nondecreasing on a
  * symmetric PSD matrix; PcaSpec pins that plus unit norm.
  */
object Pca {

  val Dim = 64
  val Iters = 6

  /** Power-iteration start value (≈ 1/√Dim with 9 generic decimal
    * places; only the direction matters — step 1 normalizes).
    */
  val Seed = 0.118033989

  /** Round, decimal-cast, order-free sum → double (the dsum pattern
    * at 9 dp for doubles that are not exactly decimal). Per-row cost
    * is a BigDecimal allocation — fine for the constant-size
    * iteration frames, NOT for the corpus-sized passes.
    */
  private def rsum(c: org.apache.spark.sql.Column) =
    sum(round(c, 9).cast(DecimalType(28, 9))).cast("double")

  /** Corpus-sized passes use the quantized long sum (see
    * [[graft.Tables.qsum]]); the constant-size iteration frames keep
    * the decimal pattern above.
    */
  private def qsum(c: org.apache.spark.sql.Column) = graft.Tables.qsum(c)
  private def qsumSql(expr: String): String = graft.Tables.qsumSql(expr)

  private def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** (i, j, c): the centered covariance matrix SCALED BY N (i.e. the
    * scatter matrix), i/j in 1..Dim. Skipping the /n keeps every cov
    * entry a sum of rounded terms — a division by a round count like
    * 500 would turn each 9-dp entry into an exact 12-dp decimal whose
    * 9-dp rounding lands on a .5 tie with probability ~1e-3/entry,
    * where the two engines' rounding of the nearest DOUBLE disagrees
    * ~half the time. Eigenvectors and the variance share are
    * n-invariant; the one eigenvalue is divided by n at the very end.
    * The mean rides the same order-free decimal sum (a plain avg's
    * partial double sums are shuffle-order-dependent).
    */
  /** (vec_id, i, x): mean-centered vector components, i in 1..Dim. */
  private[graft] def centered(vecs: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    val comp = vecs.select($"vec_id", posexplode($"embedding"))
      .select($"vec_id", ($"pos" + 1).as("i"), $"col".cast("double").as("x"))
    val mean = comp.groupBy($"i")
      .agg(round(qsum($"x") / count(lit(1)), 6).as("mu"))
    comp.join(broadcast(mean), "i")
      .select($"vec_id", $"i", ($"x" - $"mu").as("x"))
  }

  private[graft] def covariance(vecs: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    val cent = centered(vecs)
    cent.as("a")
      .join(cent.as("b"), Seq("vec_id"))
      .select($"a.i".as("i"), $"b.i".as("j"), ($"a.x" * $"b.x").as("p"))
      .groupBy($"i", $"j")
      .agg(qsum($"p").as("c"))
  }

  /** Decimal-quantized term for the order-free HOF sums below — the
    * array-fold twin of [[rsum]] (accumulator held at DECIMAL(28,9),
    * re-cast each fold step so the lambda's type matches the zero's).
    */
  private def qdec(c: org.apache.spark.sql.Column) =
    round(c, 9).cast(DecimalType(28, 9))

  /** One normalized power step: v ← C·v / ‖C·v‖.
    *
    * The 64-row product w = C·v is collapsed to a SINGLE array row
    * and the norm is an `aggregate` fold over that array — the same
    * rounded-decimal arithmetic as the old broadcast-norm form
    * (values identical, oracle unchanged), but w is referenced
    * exactly ONCE, so a step's plan no longer holds the previous
    * step twice and the iterate chain stops doubling when left lazy.
    */
  private def step(cov: DataFrame, v: DataFrame): DataFrame = {
    import cov.sparkSession.implicits._
    cov.join(broadcast(v), $"j" === $"k")
      .groupBy($"i")
      .agg(rsum($"c" * $"vk").as("w"))
      .agg(sort_array(collect_list(struct($"i", $"w"))).as("ws"))
      .select($"ws", sqrt(aggregate($"ws", lit(0).cast(DecimalType(28, 9)),
        (acc, x) => (acc + qdec(x.getField("w") * x.getField("w")))
          .cast(DecimalType(28, 9))).cast("double")).as("nrm"))
      .select(explode($"ws").as("e"), $"nrm")
      .select($"e.i".as("k"), round($"e.w" / $"nrm", 9).as("vk"))
  }

  /** The leading eigenvector after `iters` normalized power steps
    * over a (materialized) covariance frame.
    */
  private def iterate(spark: SparkSession, cov: DataFrame,
      iters: Int): DataFrame = {
    import spark.implicits._
    // start direction: a constant with 9 generic decimal places — an
    // exact-short start like 0.125 makes round(c*vk, 9) hit exact .5
    // ties at probability 1/8 per term, where the engines' double
    // rounding disagrees; 9-dp × 9-dp products tie at ~1e-9 instead
    var v = spark.range(1, Dim + 1).toDF("k")
      .select($"k", lit(Seed).as("vk"))
    // with the single-reference step above, an intermediate iterate
    // is consumed once by the next step — graft.Staging's
    // every-second-round cadence halves the eager jobs; the FINAL
    // iterate is multi-consumed (rayleigh, scores, deflation) and
    // stays staged
    for (r <- 1 to iters) {
      val next = step(cov, v)
      v = if (graft.Staging.stagePoint(r, iters, stageFinal = true))
        materialize(next) else next
    }
    v
  }

  /** λ = vᵀCv as a 1-row frame (v unit ⇒ the Rayleigh quotient). */
  private def rayleigh(cov: DataFrame, v: DataFrame): DataFrame = {
    import cov.sparkSession.implicits._
    cov.join(broadcast(v.select($"k".as("j"), $"vk".as("vj"))), "j")
      .join(broadcast(v.select($"k".as("i"), $"vk".as("vi"))), "i")
      .agg(rsum($"vi" * $"c" * $"vj").as("lambda"))
  }

  /** Covariance + leading component staged per (session, dir): the
    * D×D covariance is the ONLY corpus-sized pass and all three
    * graded PCA queries (and any downstream transform) read the same
    * fitted artifact — the fit-once/apply-many PCA lifecycle.
    */
  private val sessionStage = new graft.Staging.SessionCache()

  private def stagedCov(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sessionStage.getOrBuild(spark, dir, "cov")(materialize(covariance(
      load(spark, dir, "embeddings").select($"vec_id", $"embedding"))))
  }

  private def stagedV1(spark: SparkSession, dir: String): DataFrame =
    sessionStage.getOrBuild(spark, dir, "pc1")(
      iterate(spark, stagedCov(spark, dir), Iters))

  /** Drop the staged PCA artifacts for `(spark, dir)`. */
  def invalidate(spark: SparkSession, dir: String): Unit =
    sessionStage.invalidate(spark, dir)

  def embPca(spark: SparkSession, dir: String): DataFrame =
    embPcaWith(spark, dir, Iters)

  private[graft] def embPcaWith(spark: SparkSession, dir: String,
      iters: Int): DataFrame = {
    import spark.implicits._
    val vecs = load(spark, dir, "embeddings").select($"vec_id", $"embedding")
    val nframe = vecs.agg(count(lit(1)).as("n"))
    val cov = stagedCov(spark, dir)
    val v = if (iters == Iters) stagedV1(spark, dir) else iterate(spark, cov, iters)
    // Rayleigh quotient λ = vᵀCv (v is unit) and the variance total
    // trace(C) give the explained-variance share of the leading PC
    val lambda = rayleigh(cov, v)
    val trace = cov.where($"i" === $"j").agg(rsum($"c").as("tr"))
    v.crossJoin(broadcast(lambda)).crossJoin(broadcast(trace))
      .crossJoin(broadcast(nframe))
      .select($"k".as("pos"), $"vk".as("loading_r"),
        round($"lambda" / $"n", 6).as("eigval_r"),
        round($"lambda" / $"tr", 6).as("var_share_r"))
      .orderBy($"pos")
  }

  /** D27b: per-vector PC1 scores (`emb_pca_scores`) — the projection
    * that actually APPLIES the learned component to the corpus: score
    * = Σᵢ xᵢ·vᵢ over centered components. The corpus-sized part is one
    * map-side broadcast join (64-row vector) + a per-vector decimal
    * sum; output is corpus-sized by design (one coordinate per
    * vector), so nothing here shuffles more than the input.
    */
  def embPcaScores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vecs = load(spark, dir, "embeddings").select($"vec_id", $"embedding")
    val v = stagedV1(spark, dir)
    centered(vecs)
      .join(broadcast(v.select($"k".as("i"), $"vk")), "i")
      .groupBy($"vec_id")
      .agg(qsum($"x" * $"vk").as("pc1_score"))
      .orderBy($"vec_id")
  }

  /** One power step with Gram–Schmidt projection against `v1`:
    * w ← C·v; w ← w − (w·v₁)v₁; v ← w/‖w‖ — orthogonal iteration's
    * second column. Plain deflation (C − λ₁v₁v₁ᵀ) breaks down
    * exactly on THIS corpus: the embedding spectrum is
    * near-degenerate (λ₂/λ₁ ≈ 0.98), so after any fixed iteration
    * budget v₁ still carries off-eigenvector mass and the deflated
    * matrix leaks it back (measured v₁·v₂ ≈ 0.085). The explicit
    * per-step projection forces orthogonality BY CONSTRUCTION
    * regardless of convergence speed.
    */
  private def stepOrth(cov: DataFrame, v: DataFrame, v1: DataFrame): DataFrame = {
    import cov.sparkSession.implicits._
    // same single-array-row restructuring as [[step]]: w meets v1
    // once, then the deflation dot product, the projected residual,
    // and its norm are HOF folds over the one row — identical
    // rounded-decimal arithmetic, every intermediate referenced once
    val p1 = v1.select($"k".as("i"), $"vk".as("v1"))
    cov.join(broadcast(v), $"j" === $"k")
      .groupBy($"i").agg(rsum($"c" * $"vk").as("w"))
      .join(broadcast(p1), "i")
      .agg(sort_array(collect_list(struct($"i", $"w", $"v1"))).as("ws"))
      .select($"ws", aggregate($"ws", lit(0).cast(DecimalType(28, 9)),
        (acc, x) => (acc + qdec(x.getField("w") * x.getField("v1")))
          .cast(DecimalType(28, 9))).cast("double").as("d"))
      .select(transform($"ws", x => struct(
        x.getField("i").as("i"),
        round(x.getField("w") - $"d" * x.getField("v1"), 9).as("w"))).as("wp"))
      .select($"wp", sqrt(aggregate($"wp", lit(0).cast(DecimalType(28, 9)),
        (acc, x) => (acc + qdec(x.getField("w") * x.getField("w")))
          .cast(DecimalType(28, 9))).cast("double")).as("nrm"))
      .select(explode($"wp").as("e"), $"nrm")
      .select($"e.i".as("k"), round($"e.w" / $"nrm", 9).as("vk"))
  }

  /** D27c: top-2 components (`emb_pca2`) — the step from "a leading
    * direction" to an actual low-rank transform: a second iteration
    * chain over the SAME covariance frame, orthogonalized against v₁
    * every step ([[stepOrth]]). The corpus is touched exactly once,
    * by the shared covariance pass; both chains run on the
    * materialized D×D frame with 64-row iterates.
    */
  /** Second component staged per (session, dir), like [[stagedV1]] —
    * the D27c orthogonal-iteration chain, shared by `emb_pca2` and
    * the whitening transform.
    */
  private def stagedV2(spark: SparkSession, dir: String): DataFrame =
    sessionStage.getOrBuild(spark, dir, "pc2") {
      import spark.implicits._
      val cov = stagedCov(spark, dir)
      val v1 = stagedV1(spark, dir)
      var v2 = spark.range(1, Dim + 1).toDF("k")
        .select($"k", lit(Seed).as("vk"))
      for (r <- 1 to Iters) {
        val next = stepOrth(cov, v2, v1)
        v2 = if (graft.Staging.stagePoint(r, Iters, stageFinal = true))
          materialize(next) else next
      }
      v2
    }

  def embPca2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vecs = load(spark, dir, "embeddings").select($"vec_id", $"embedding")
    val nframe = vecs.agg(count(lit(1)).as("n"))
    val cov = stagedCov(spark, dir)
    val v1 = stagedV1(spark, dir)
    val lam1 = rayleigh(cov, v1)
    val v2 = stagedV2(spark, dir)
    val lam2 = rayleigh(cov, v2)
    v1.select($"k", $"vk".as("l1"))
      .join(v2.select($"k", $"vk".as("l2")), "k")
      .crossJoin(broadcast(lam1.select($"lambda".as("lambda1"))))
      .crossJoin(broadcast(lam2.select($"lambda".as("lambda2"))))
      .crossJoin(broadcast(nframe))
      .select($"k".as("pos"), $"l1".as("loading1_r"), $"l2".as("loading2_r"),
        round($"lambda1" / $"n", 6).as("eigval1_r"),
        round($"lambda2" / $"n", 6).as("eigval2_r"))
      .orderBy($"pos")
  }

  /** The oracle's decimal-sum helper over an expression per row set:
    * written inline — DuckDB's sum over DECIMAL is exact like Spark's.
    */
  /** One oracle power step over covariance CTE `cov`; `p` prefixes
    * the step CTE names so a second (deflated) chain can coexist.
    * The shared v0 seed CTE is used by both chains.
    */
  private def stepCte(i: Int, covName: String = "cov", p: String = ""): String = {
    val prev = if (i == 1) "v0" else s"${p}v${i - 1}"
    s"""${p}w$i AS MATERIALIZED (
       |  SELECT c.i,
       |    CAST(sum(CAST(round(c.c * v.vk, 9) AS DECIMAL(28, 9))) AS DOUBLE) AS w
       |  FROM $covName c JOIN $prev v ON v.k = c.j GROUP BY c.i),
       |${p}n$i AS MATERIALIZED (
       |  SELECT sqrt(CAST(sum(CAST(round(w * w, 9) AS DECIMAL(28, 9))) AS DOUBLE)) AS nrm
       |  FROM ${p}w$i),
       |${p}v$i AS MATERIALIZED (
       |  SELECT i AS k, round(w / (SELECT nrm FROM ${p}n$i), 9) AS vk FROM ${p}w$i)""".stripMargin
  }

  /** Shared oracle CTE chain: components → centering → covariance →
    * v0 → (w/n/v)×Iters. Every CTE is MATERIALIZED: cov feeds all
    * Iters steps (+ λ + trace) and each v_i appears under both w_{i+1}
    * and the norm subquery, so un-materialized inlining would replay
    * the chain exponentially — the oracle-side dual of the Spark
    * per-step checkpoint.
    */
  private val cteChain: String = {
    val steps = (1 to Iters).map(i => stepCte(i)).mkString(",\n")
    s"""WITH comp AS MATERIALIZED (
       |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
       |  FROM embeddings, range(1, ${Dim + 1}) t(i)),
       |mean AS MATERIALIZED (
       |  SELECT i, round(${qsumSql("x")} / count(*), 6) AS mu
       |  FROM comp GROUP BY i),
       |centered AS MATERIALIZED (
       |  SELECT c.vec_id, c.i, c.x - m.mu AS x
       |  FROM comp c JOIN mean m USING (i)),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM embeddings),
       |cov AS MATERIALIZED (
       |  SELECT a.i, b.i AS j, ${qsumSql("a.x * b.x")} AS c
       |  FROM centered a JOIN centered b USING (vec_id)
       |  GROUP BY a.i, b.i),
       |v0 AS MATERIALIZED (
       |  SELECT i AS k, CAST($Seed AS DOUBLE) AS vk
       |  FROM range(1, ${Dim + 1}) t(i)),
       |$steps""".stripMargin
  }

  val embPcaSql: String =
    s"""$cteChain,
       |lam AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(round(vi.vk * c.c * vj.vk, 9) AS DECIMAL(28, 9))) AS DOUBLE) AS lambda
       |  FROM cov c
       |  JOIN v$Iters vj ON vj.k = c.j
       |  JOIN v$Iters vi ON vi.k = c.i),
       |tr AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(round(c, 9) AS DECIMAL(28, 9))) AS DOUBLE) AS tr
       |  FROM cov WHERE i = j)
       |SELECT v.k AS pos, v.vk AS loading_r,
       |  round((SELECT lambda FROM lam) / (SELECT n FROM nn), 6) AS eigval_r,
       |  round((SELECT lambda FROM lam) / (SELECT tr FROM tr), 6) AS var_share_r
       |FROM v$Iters v ORDER BY pos""".stripMargin

  /** Oracle step with the Gram–Schmidt projection against v_Iters. */
  private def stepOrthCte(i: Int): String = {
    val prev = if (i == 1) "v0" else s"bv${i - 1}"
    s"""bw$i AS MATERIALIZED (
       |  SELECT c.i,
       |    CAST(sum(CAST(round(c.c * v.vk, 9) AS DECIMAL(28, 9))) AS DOUBLE) AS w
       |  FROM cov c JOIN $prev v ON v.k = c.j GROUP BY c.i),
       |bd$i AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(round(w.w * v.vk, 9) AS DECIMAL(28, 9))) AS DOUBLE) AS d
       |  FROM bw$i w JOIN v$Iters v ON v.k = w.i),
       |bp$i AS MATERIALIZED (
       |  SELECT w.i, round(w.w - (SELECT d FROM bd$i) * v.vk, 9) AS w
       |  FROM bw$i w JOIN v$Iters v ON v.k = w.i),
       |bn$i AS MATERIALIZED (
       |  SELECT sqrt(CAST(sum(CAST(round(w * w, 9) AS DECIMAL(28, 9))) AS DOUBLE)) AS nrm
       |  FROM bp$i),
       |bv$i AS MATERIALIZED (
       |  SELECT i AS k, round(w / (SELECT nrm FROM bn$i), 9) AS vk FROM bp$i)""".stripMargin
  }

  val embPca2Sql: String = {
    val steps2 = (1 to Iters).map(stepOrthCte).mkString(",\n")
    s"""$cteChain,
       |lam1 AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(round(vi.vk * c.c * vj.vk, 9) AS DECIMAL(28, 9))) AS DOUBLE) AS lambda
       |  FROM cov c
       |  JOIN v$Iters vj ON vj.k = c.j
       |  JOIN v$Iters vi ON vi.k = c.i),
       |$steps2,
       |lam2 AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(round(vi.vk * c.c * vj.vk, 9) AS DECIMAL(28, 9))) AS DOUBLE) AS lambda
       |  FROM cov c
       |  JOIN bv$Iters vj ON vj.k = c.j
       |  JOIN bv$Iters vi ON vi.k = c.i)
       |SELECT a.k AS pos, a.vk AS loading1_r, b.vk AS loading2_r,
       |  round((SELECT lambda FROM lam1) / (SELECT n FROM nn), 6) AS eigval1_r,
       |  round((SELECT lambda FROM lam2) / (SELECT n FROM nn), 6) AS eigval2_r
       |FROM v$Iters a JOIN bv$Iters b ON b.k = a.k
       |ORDER BY pos""".stripMargin
  }

  val embPcaScoresSql: String =
    s"""$cteChain
       |SELECT c.vec_id, ${qsumSql("c.x * v.vk")} AS pc1_score
       |FROM centered c JOIN v$Iters v ON v.k = c.i
       |GROUP BY c.vec_id ORDER BY vec_id""".stripMargin

  /** D27d: PCA whitening (`emb_whitening`) — the 2-component
    * whitened-coordinate transform retrieval and SemDeDup-style
    * pipelines standardize on: project each centered vector on the
    * staged (v₁, v₂) basis and scale each coordinate to unit variance
    * by 1/√(λᵢ/n). The corpus-sized work is ONE map-side pass —
    * broadcast 64-row loadings, two per-vector quantized dot folds —
    * everything spectral (covariance, both component chains, both
    * Rayleigh quotients) is the staged D×D machinery shared with
    * D27/D27c. Output corpus-sized by design; nothing shuffles more
    * than the input.
    */
  def embWhitening(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vecs = load(spark, dir, "embeddings").select($"vec_id", $"embedding")
    val nframe = vecs.agg(count(lit(1)).as("n"))
    val cov = stagedCov(spark, dir)
    val v1 = stagedV1(spark, dir)
    val v2 = stagedV2(spark, dir)
    val lam1 = rayleigh(cov, v1).select($"lambda".as("lambda1"))
    val lam2 = rayleigh(cov, v2).select($"lambda".as("lambda2"))
    centered(vecs)
      .join(broadcast(v1.select($"k".as("i"), $"vk".as("v1k"))), "i")
      .join(broadcast(v2.select($"k".as("i"), $"vk".as("v2k"))), "i")
      .groupBy($"vec_id")
      .agg(qsum($"x" * $"v1k").as("p1"), qsum($"x" * $"v2k").as("p2"))
      .crossJoin(broadcast(lam1)).crossJoin(broadcast(lam2))
      .crossJoin(broadcast(nframe))
      .select($"vec_id",
        round($"p1" / sqrt($"lambda1" / $"n"), 6).as("w1_r"),
        round($"p2" / sqrt($"lambda2" / $"n"), 6).as("w2_r"))
      .orderBy($"vec_id")
  }

  val embWhiteningSql: String = {
    val steps2 = (1 to Iters).map(stepOrthCte).mkString(",\n")
    s"""$cteChain,
       |lam1 AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(round(vi.vk * c.c * vj.vk, 9) AS DECIMAL(28, 9))) AS DOUBLE) AS lambda
       |  FROM cov c
       |  JOIN v$Iters vj ON vj.k = c.j
       |  JOIN v$Iters vi ON vi.k = c.i),
       |$steps2,
       |lam2 AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(round(vi.vk * c.c * vj.vk, 9) AS DECIMAL(28, 9))) AS DOUBLE) AS lambda
       |  FROM cov c
       |  JOIN bv$Iters vj ON vj.k = c.j
       |  JOIN bv$Iters vi ON vi.k = c.i),
       |pr AS MATERIALIZED (
       |  SELECT c.vec_id,
       |    ${qsumSql("c.x * va.vk")} AS p1,
       |    ${qsumSql("c.x * vb.vk")} AS p2
       |  FROM centered c
       |  JOIN v$Iters va ON va.k = c.i
       |  JOIN bv$Iters vb ON vb.k = c.i
       |  GROUP BY c.vec_id)
       |SELECT vec_id,
       |  round(p1 / sqrt((SELECT lambda FROM lam1) / (SELECT n FROM nn)), 6)
       |    AS w1_r,
       |  round(p2 / sqrt((SELECT lambda FROM lam2) / (SELECT n FROM nn)), 6)
       |    AS w2_r
       |FROM pr ORDER BY vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_pca" -> embPca _,
    "emb_pca2" -> embPca2 _,
    "emb_pca_scores" -> embPcaScores _,
    "emb_whitening" -> embWhitening _)

  val oracleSql: Map[String, String] = Map(
    "emb_pca" -> embPcaSql,
    "emb_pca2" -> embPca2Sql,
    "emb_pca_scores" -> embPcaScoresSql,
    "emb_whitening" -> embWhiteningSql)
}
