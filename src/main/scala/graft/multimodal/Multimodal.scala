package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Multimodal column plumbing (SURVEY §2 D12): opaque `binary`
  * payloads + typed metadata, processed by a *batched* per-partition
  * decode stage — the shape a real image/audio pipeline has on Spark
  * (payload bytes → decoder → feature columns), with the decoder
  * STUBBED: no media libraries ship in this environment, so
  * [[StubDecoder.decode]] computes deterministic byte statistics in
  * place of pixels. Everything around it — binary column, metadata
  * struct, partition-local batch iteration, typed output Encoder — is
  * the real distributed plumbing and is exercised end-to-end.
  *
  * Scale notes: decode is a map-only stage (no shuffle); batching
  * bounds peak memory per task regardless of partition size, the same
  * contract `mapInPandas`/`mapInArrow` batches give Python decoders.
  */
object Multimodal {

  /** Post-decode feature row. */
  case class MediaStats(doc_id: Long, kind: String, n_bytes: Long,
      checksum: Long, n_hi: Long, aspect: Double)

  /** STUB decoder — stands in for libjpeg/ffmpeg/etc. Deterministic
    * byte statistics so the DuckDB oracle can replicate the output;
    * a real deployment swaps `decode` for the actual media decode and
    * keeps every signature.
    */
  object StubDecoder {
    val Mod = 1000000007L
    def decode(docId: Long, kind: String, payload: Array[Byte],
        width: Int, height: Int): MediaStats = {
      var checksum = 0L
      var hi = 0L
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        checksum = (checksum + b) % Mod
        if (b > 109) hi += 1
        i += 1
      }
      MediaStats(docId, kind, payload.length.toLong, checksum, hi,
        width.toDouble / height)
    }
  }

  /** documents → (payload binary, media metadata) — the ingest shape:
    * payload is the raw bytes (here: utf-8 text, deterministically),
    * metadata carries decode parameters.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("width", (col("n_chars") % 64 + 16).cast("int"))
      .withColumn("height", (col("n_chars") % 48 + 12).cast("int"))
      .withColumn("kind",
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video"))

  val BatchSize = 128

  /** D12: batched decode → feature columns. */
  def decodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withPayload(load(spark, dir, "documents"))
      .select($"doc_id", $"kind", $"payload", $"width", $"height")
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          // batch boundary = where a real decoder would amortize model
          // / codec setup; the stub decodes row-wise within the batch.
          batch.map { case (id, kind, payload, w, h) =>
            StubDecoder.decode(id, kind, payload, w, h)
          }
        }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  /** STUB resize — real decoders downsample pixels; the stand-in takes
    * every k-th payload byte so the oracle can reproduce it with
    * character arithmetic. The output carries the new payload's md5
    * (not the bytes) so results stay compact and comparable.
    */
  def resizeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withPayload(load(spark, dir, "documents"))
      .select($"doc_id", $"payload", $"width", $"height")
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, payload, w, h) =>
            val step = 4 // "quarter resolution"
            val resized = payload.indices.collect {
              case i if i % step == 0 => payload(i)
            }.toArray
            val md5 = java.security.MessageDigest.getInstance("MD5")
              .digest(resized).map("%02x".format(_)).mkString
            (id, resized.length.toLong, md5, w / 2, h / 2)
          }
        }
      }
      .toDF("doc_id", "resized_bytes", "resized_md5", "out_w", "out_h")
      .orderBy($"doc_id")
  }

  /** STUB frame sampling — payload treated as fixed-size frames
    * (64 bytes each, tail dropped), every 4th frame kept, per-frame
    * checksum reported as an array column (the shape a video pipeline
    * hands to a captioner).
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val FrameLen = 64; val Every = 4
    withPayload(load(spark, dir, "documents"))
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, payload) =>
            val nFrames = payload.length / FrameLen
            val sampled = (0 until nFrames).filter(_ % Every == 0)
            val sums = sampled.map { f =>
              var s = 0L
              var i = f * FrameLen
              while (i < (f + 1) * FrameLen) { s += payload(i) & 0xff; i += 1 }
              s
            }.toArray
            (id, nFrames.toLong, sums.length.toLong, sums)
          }
        }
      }
      .toDF("doc_id", "n_frames", "n_sampled", "frame_sums")
      // Graded projection: the driver's comparator cannot sort array cells,
      // so the per-frame checksums are emitted as a joined string (longs
      // format identically in Spark and DuckDB).
      .select($"doc_id", $"n_frames", $"n_sampled",
        concat_ws(",", $"frame_sums").as("frame_sums"))
      .orderBy($"doc_id")
  }

  /** D12b: exact binary dedup — content-hash dedup over the opaque
    * payload column, the modality-agnostic first pass of an
    * image/audio dedup pipeline (no decode needed; byte-identical
    * copies collapse regardless of media type — D1's text analog on
    * `binary`). Every 4th payload is planted as a duplicate (+30000)
    * so the detector has work; one shuffle on the 128-bit content
    * hash, same scale shape as D1.
    */
  def binaryDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = withPayload(load(spark, dir, "documents"))
      .select($"doc_id", $"payload")
    val corpus = base.union(base.where($"doc_id" % 4 === 0)
      .select(($"doc_id" + 30000).as("doc_id"), $"payload"))
    corpus
      .withColumn("h", md5($"payload"))
      .withColumn("keep_id", min($"doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"h")))
      .withColumn("is_dup", $"doc_id" =!= $"keep_id")
      .select($"doc_id", $"h", $"keep_id", $"is_dup")
      // h as secondary sort key: at a scale factor where doc_id+30000
      // collides with a real doc_id, doc_id alone would leave the
      // colliding rows' relative order engine-dependent and break the
      // bitwise compare
      .orderBy($"doc_id", $"h")
  }

  val binaryDedupSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 30000 AS doc_id, text FROM documents WHERE doc_id % 4 = 0)
      |SELECT doc_id, md5(text) AS h,
      |  min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
      |  doc_id != min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
      |FROM corpus ORDER BY doc_id, h""".stripMargin

  /** D12c: perceptual-hash near-dup (`mm_phash_dedup`) — the media
    * analog of MinHash: a re-encoded/lossily-recompressed copy is
    * byte-different (exact dedup [[binaryDedup]] misses it) but
    * perceptually identical, and a hash over DECODED content features
    * collapses the pair. Classic aHash recipe on the stub decoder's
    * "pixels": sample 64 evenly-spaced bytes (cell i = byte i·step,
    * step = ⌊n/64⌋), bit i = sampled value above the sampled mean
    * (integer cross-multiplied — no division), hash = the 64-char
    * bit string (strings sidestep BIGINT sign overflow in both
    * engines). Copies of every 5th doc are planted (+40000) with
    * "re-encode noise" — bytes at positions ≡ 2 (mod step) flipped to
    * 'z', which by construction never touches a sampled position
    * (sampled ≡ 1 mod step): their md5 differs, their aHash doesn't —
    * QueriesSmokeSpec pins both halves. Dedup itself is one shuffle
    * on the hash, exactly D1's shape; hamming-tolerant matching
    * (τ > 0) composes with D3's pigeonhole segment blocking.
    */
  object PHash {
    val Cells = 64
    def step(n: Int): Int = math.max(n / Cells, 1)
    def corrupt(payload: Array[Byte]): Array[Byte] = {
      val s = step(payload.length)
      val out = payload.clone()
      if (s >= 3) {
        // positions are 1-based in the contract (oracle substring);
        // byte index p-1 for p ≡ 2 (mod s)
        var p = 2
        while (p <= out.length) { out(p - 1) = 'z'.toByte; p += s }
      }
      out
    }
    def ahash(payload: Array[Byte]): String = {
      val n = payload.length
      val s = step(n)
      val vals = (0 until Cells).collect {
        case i if i * s < n => payload(i * s) & 0xff
      }
      val sum = vals.sum
      vals.map(v => if (v.toLong * vals.length > sum) '1' else '0').mkString
    }
  }

  def phashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withPayload(load(spark, dir, "documents"))
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap(_.flatMap { case (id, p) =>
          val orig = (id, PHash.ahash(p))
          if (id % 5 == 0) Seq(orig, (id + 40000, PHash.ahash(PHash.corrupt(p))))
          else Seq(orig)
        })
      }
      .toDF("doc_id", "phash")
      .withColumn("keep_id", min($"doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"phash")))
      .withColumn("is_dup", $"doc_id" =!= $"keep_id")
      .select($"doc_id", $"phash", $"keep_id", $"is_dup")
      .orderBy($"doc_id", $"phash")
  }

  val phashDedupSql: String =
    """WITH base AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    greatest(length(text) // 64, 1) AS step
      |  FROM documents),
      |corpus AS (
      |  SELECT doc_id, text, n, step FROM base
      |  UNION ALL
      |  SELECT doc_id + 40000 AS doc_id,
      |    CASE WHEN step >= 3 THEN
      |      array_to_string(list_transform(range(1, n + 1),
      |        p -> CASE WHEN p % step = 2 THEN 'z'
      |             ELSE substring(text, p, 1) END), '')
      |    ELSE text END AS text,
      |    n, step
      |  FROM base WHERE doc_id % 5 = 0),
      |vals AS (
      |  SELECT doc_id,
      |    list_filter(list_transform(range(0, 64),
      |      i -> CASE WHEN i * step + 1 <= n
      |           THEN ascii(substring(text, i * step + 1, 1)) END),
      |      v -> v IS NOT NULL) AS vs
      |  FROM corpus),
      |ph AS (
      |  SELECT doc_id,
      |    array_to_string(list_transform(vs,
      |      v -> CASE WHEN v * len(vs) >
      |             list_reduce(list_prepend(0, vs), (a, b) -> a + b)
      |           THEN '1' ELSE '0' END), '') AS phash
      |  FROM vals)
      |SELECT doc_id, phash,
      |  min(doc_id) OVER (PARTITION BY phash) AS keep_id,
      |  doc_id != min(doc_id) OVER (PARTITION BY phash) AS is_dup
      |FROM ph ORDER BY doc_id, phash""".stripMargin

  /** Post-decode pixel-feature row for the REAL codec path. Failed
    * decodes carry nulls — a production pipeline must count and route
    * them, not crash the stage.
    */
  case class ImageStats(doc_id: Long, ok: Boolean, w_px: Option[Long],
      h_px: Option[Long], sum_r: Option[Long], sum_g: Option[Long],
      sum_b: Option[Long], n_bright: Option[Long])

  /** Deterministic RGB formula shared by the raster generator and the
    * DuckDB oracle — PNG is lossless, so decoded pixels equal
    * generated pixels and the oracle can score the REAL codec path.
    */
  @inline private def fr(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  @inline private def fg(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 11 + y * 5) % 256).toInt
  @inline private def fb(id: Long, x: Int, y: Int): Int = ((id * 23 + x * 3 + y * 19) % 256).toInt

  /** Each doc's deterministic raster, run through the REAL PNG
    * encoder (`javax.imageio.ImageIO`). Every 97th payload is
    * truncated after encode — a genuinely corrupt file for the decode
    * error path.
    */
  /** See [[graft.Staging.spreadNarrow]]. */
  private def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.Staging.spreadNarrow(df)

  /** ImageIO's default ImageInputStream/ImageOutputStream cache is a
    * TEMP FILE per encode/decode call; with 32 task threads pushing
    * thousands of small in-memory rasters through the codec, that
    * turns a pure-CPU stage into per-image disk churn (create, write,
    * read back, delete) on shared /tmp. The flag is JVM-global and
    * idempotent — flip it at the top of every codec mapPartitions so
    * executors decode from heap buffers. Output bytes are unchanged.
    */
  @inline private def inMemoryImageIO(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  private def pngPayloads(spark: SparkSession, dir: String) = {
    import spark.implicits._
    spread(load(spark, dir, "documents"))
      .select(col("doc_id"),
        (col("n_chars") % 64 + 16).cast("int").as("w"),
        (col("n_chars") % 48 + 12).cast("int").as("h"))
      .as[(Long, Int, Int)]
      .mapPartitions { rows =>
        inMemoryImageIO()
        rows.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, w, h) =>
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            // one bulk setRGB: the per-pixel call dispatches through
            // the ColorModel for every pixel; filling a row-major
            // int[] and storing it once writes the same ARGB words
            val px = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                px(y * w + x) =
                  (fr(id, x, y) << 16) | (fg(id, x, y) << 8) | fb(id, x, y)
                x += 1
              }
              y += 1
            }
            img.setRGB(0, 0, w, h, px, 0, w)
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            val bytes = bos.toByteArray
            (id, if (id % 97 == 0) bytes.take(24) else bytes)
          }
        }
      }
      .toDF("doc_id", "png")
  }

  /** D12d: REAL image decode (`mm_image_decode`) — the declared
    * replacement for the byte-stats stand-in: actual PNG bytes
    * through the JVM's `ImageIO` codec in a batched partition-local
    * decode stage, corrupt files surfacing as `ok = false` rows
    * instead of task failures. Gradable against DuckDB because the
    * rasters are generated from a shared deterministic formula and
    * PNG round-trips losslessly — the oracle scores the pixels the
    * codec must reproduce, so a decoder that didn't really parse the
    * file cannot pass. Map-only at 100 TB (encode+decode ride the
    * scan; no shuffle before the final per-doc row).
    */
  def imageDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pngPayloads(spark, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        inMemoryImageIO()
        rows.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, png) =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
              catch { case _: Exception => null }
            if (img == null) ImageStats(id, ok = false, None, None, None, None, None, None)
            else {
              // bulk getRGB: same ARGB words as the per-pixel call,
              // one ColorModel pass instead of w*h dispatches
              val w = img.getWidth; val h = img.getHeight
              val px = img.getRGB(0, 0, w, h, null, 0, w)
              var (sr, sg, sb, nb) = (0L, 0L, 0L, 0L)
              var i = 0
              while (i < px.length) {
                val p = px(i)
                val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
                sr += r; sg += g; sb += b
                if (r + g + b > 384) nb += 1
                i += 1
              }
              ImageStats(id, ok = true, Some(w.toLong),
                Some(h.toLong), Some(sr), Some(sg), Some(sb), Some(nb))
            }
          }
        }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  val imageDecodeSql: String =
    """WITH d AS (
      |  SELECT doc_id, n_chars % 64 + 16 AS w, n_chars % 48 + 12 AS h
      |  FROM documents),
      |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
      |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
      |c AS (
      |  SELECT doc_id, w, h,
      |    (doc_id * 31 + x * 7 + y * 13) % 256 AS r,
      |    (doc_id * 17 + x * 11 + y * 5) % 256 AS g,
      |    (doc_id * 23 + x * 3 + y * 19) % 256 AS b
      |  FROM px),
      |s AS (
      |  SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
      |    sum(r) AS sum_r, sum(g) AS sum_g, sum(b) AS sum_b,
      |    count(*) FILTER (WHERE r + g + b > 384) AS n_bright
      |  FROM c GROUP BY doc_id)
      |SELECT doc_id, (doc_id % 97 != 0) AS ok,
      |  CASE WHEN doc_id % 97 != 0 THEN CAST(w AS BIGINT) END AS w_px,
      |  CASE WHEN doc_id % 97 != 0 THEN CAST(h AS BIGINT) END AS h_px,
      |  CASE WHEN doc_id % 97 != 0 THEN CAST(sum_r AS BIGINT) END AS sum_r,
      |  CASE WHEN doc_id % 97 != 0 THEN CAST(sum_g AS BIGINT) END AS sum_g,
      |  CASE WHEN doc_id % 97 != 0 THEN CAST(sum_b AS BIGINT) END AS sum_b,
      |  CASE WHEN doc_id % 97 != 0 THEN CAST(n_bright AS BIGINT) END AS n_bright
      |FROM s ORDER BY doc_id""".stripMargin

  /** D12e: REAL pixel resize (`mm_image_resize`) — 2×2 area-average
    * downsample computed on the DECODED raster (integer floor mean
    * per channel, blocks fully inside the frame), the exact-arithmetic
    * core of a thumbnail/patch-extract stage. Same real-codec grading
    * trick as D12d; corrupt files pass through as `ok = false`.
    */
  def imageResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pngPayloads(spark, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        inMemoryImageIO()
        rows.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, png) =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
              catch { case _: Exception => null }
            if (img == null) (id, false, None: Option[Long], None: Option[Long], None: Option[Long])
            else {
              val w = img.getWidth
              val px = img.getRGB(0, 0, w, img.getHeight, null, 0, w)
              val w2 = img.getWidth / 2; val h2 = img.getHeight / 2
              var s = 0L
              var by = 0
              while (by < h2) {
                var bx = 0
                while (bx < w2) {
                  var (sr, sg, sb) = (0, 0, 0)
                  var dy = 0
                  while (dy < 2) {
                    var dx = 0
                    while (dx < 2) {
                      val p = px((by * 2 + dy) * w + bx * 2 + dx)
                      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                      dx += 1
                    }
                    dy += 1
                  }
                  s += (sr / 4) + (sg / 4) + (sb / 4)
                  bx += 1
                }
                by += 1
              }
              (id, true, Some(w2.toLong), Some(h2.toLong), Some(s))
            }
          }
        }
      }
      .toDF("doc_id", "ok", "out_w", "out_h", "pooled_sum")
      .orderBy($"doc_id")
  }

  val imageResizeSql: String =
    """WITH d AS (
      |  SELECT doc_id, n_chars % 64 + 16 AS w, n_chars % 48 + 12 AS h
      |  FROM documents),
      |bxs AS (SELECT doc_id, w, h, unnest(range(0, w // 2)) AS bx FROM d),
      |blk AS (SELECT doc_id, w, h, bx, unnest(range(0, h // 2)) AS by FROM bxs),
      |p AS (
      |  SELECT doc_id, w, h,
      |    (((doc_id*31 + (bx*2)*7   + (by*2)*13)   % 256)
      |     + ((doc_id*31 + (bx*2+1)*7 + (by*2)*13)   % 256)
      |     + ((doc_id*31 + (bx*2)*7   + (by*2+1)*13) % 256)
      |     + ((doc_id*31 + (bx*2+1)*7 + (by*2+1)*13) % 256)) // 4 AS ar,
      |    (((doc_id*17 + (bx*2)*11   + (by*2)*5)   % 256)
      |     + ((doc_id*17 + (bx*2+1)*11 + (by*2)*5)   % 256)
      |     + ((doc_id*17 + (bx*2)*11   + (by*2+1)*5) % 256)
      |     + ((doc_id*17 + (bx*2+1)*11 + (by*2+1)*5) % 256)) // 4 AS ag,
      |    (((doc_id*23 + (bx*2)*3   + (by*2)*19)   % 256)
      |     + ((doc_id*23 + (bx*2+1)*3 + (by*2)*19)   % 256)
      |     + ((doc_id*23 + (bx*2)*3   + (by*2+1)*19) % 256)
      |     + ((doc_id*23 + (bx*2+1)*3 + (by*2+1)*19) % 256)) // 4 AS ab
      |  FROM blk),
      |s AS (
      |  SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
      |    sum(ar + ag + ab) AS pooled
      |  FROM p GROUP BY doc_id)
      |SELECT doc_id, (doc_id % 97 != 0) AS ok,
      |  CASE WHEN doc_id % 97 != 0 THEN CAST(w // 2 AS BIGINT) END AS out_w,
      |  CASE WHEN doc_id % 97 != 0 THEN CAST(h // 2 AS BIGINT) END AS out_h,
      |  CASE WHEN doc_id % 97 != 0 THEN CAST(pooled AS BIGINT) END AS pooled_sum
      |FROM s ORDER BY doc_id""".stripMargin

  case class ImageHist(doc_id: Long, ok: Boolean, h0: Option[Long],
      h1: Option[Long], h2: Option[Long], h3: Option[Long])

  /** D12f: luminance histogram (`mm_image_histogram`) — the
    * exposure/contrast audit of a feature-extract stage: per image, a
    * 4-bucket histogram of per-pixel r+g+b (bucket = (r+g+b) div 192
    * over the 0..765 range) computed on the REAL `ImageIO`-decoded
    * raster. Same real-codec grading trick as D12d: rasters follow
    * the shared deterministic formula, so the DuckDB oracle replays
    * the exact bucket counts arithmetically while Spark earns them
    * through the actual PNG decode; corrupt payloads surface as
    * `ok = false` with NULL buckets. Map-only over the corpus.
    */
  def imageHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pngPayloads(spark, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        inMemoryImageIO()
        rows.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, png) =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
              catch { case _: Exception => null }
            if (img == null) ImageHist(id, ok = false, None, None, None, None)
            else {
              val w = img.getWidth
              val px = img.getRGB(0, 0, w, img.getHeight, null, 0, w)
              val h = new Array[Long](4)
              var i = 0
              while (i < px.length) {
                val p = px(i)
                val lum = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                h(lum / 192) += 1
                i += 1
              }
              ImageHist(id, ok = true, Some(h(0)), Some(h(1)), Some(h(2)), Some(h(3)))
            }
          }
        }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  val imageHistogramSql: String =
    """WITH d AS (
      |  SELECT doc_id, n_chars % 64 + 16 AS w, n_chars % 48 + 12 AS h
      |  FROM documents),
      |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
      |px AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM xs),
      |c AS (
      |  SELECT doc_id,
      |    ((doc_id * 31 + x * 7 + y * 13) % 256
      |     + (doc_id * 17 + x * 11 + y * 5) % 256
      |     + (doc_id * 23 + x * 3 + y * 19) % 256) // 192 AS b
      |  FROM px),
      |s AS (
      |  SELECT doc_id,
      |    count(*) FILTER (WHERE b = 0) AS h0,
      |    count(*) FILTER (WHERE b = 1) AS h1,
      |    count(*) FILTER (WHERE b = 2) AS h2,
      |    count(*) FILTER (WHERE b = 3) AS h3
      |  FROM c GROUP BY doc_id)
      |SELECT doc_id, doc_id % 97 != 0 AS ok,
      |  CASE WHEN doc_id % 97 != 0 THEN CAST(h0 AS BIGINT) END AS h0,
      |  CASE WHEN doc_id % 97 != 0 THEN CAST(h1 AS BIGINT) END AS h1,
      |  CASE WHEN doc_id % 97 != 0 THEN CAST(h2 AS BIGINT) END AS h2,
      |  CASE WHEN doc_id % 97 != 0 THEN CAST(h3 AS BIGINT) END AS h3
      |FROM s ORDER BY doc_id""".stripMargin

  case class AudioStats(doc_id: Long, ok: Boolean, sample_rate: Option[Int],
      n_samples: Option[Long], duration_us: Option[Long], peak: Option[Long],
      zc: Option[Long], ssq: Option[Long], rms_r: Option[Double])

  /** Deterministic PCM16 sample formula shared by the WAV generator
    * and the DuckDB oracle — PCM in a WAV container is lossless, so
    * decoded samples equal generated samples and the oracle scores
    * the REAL codec path. Integer sawtooth (not a sine): both engines
    * compute it in exact integer arithmetic, no libm dependence.
    */
  @inline private def fs(id: Long, i: Int): Int =
    (((id * 131 + i.toLong * (id % 7 + 3)) % 65536) - 32768).toInt

  private val WavRate = 8000

  /** Each doc's deterministic PCM16 mono signal, written through a
    * REAL RIFF/WAVE container (44-byte canonical header, LE samples).
    * Every 89th payload is truncated mid-header — a genuinely corrupt
    * file for the decode error path.
    */
  private def wavPayloads(spark: SparkSession, dir: String) = {
    import spark.implicits._
    spread(load(spark, dir, "documents"))
      .select(col("doc_id"), (col("n_chars") % 300 + 100).cast("int").as("n"))
      .as[(Long, Int)]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, n) =>
            val dataSize = 2 * n
            val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
              .put("WAVE".getBytes("US-ASCII"))
              .put("fmt ".getBytes("US-ASCII")).putInt(16)
              .putShort(1).putShort(1) // PCM, mono
              .putInt(WavRate).putInt(WavRate * 2)
              .putShort(2).putShort(16) // block align, bits
              .put("data".getBytes("US-ASCII")).putInt(dataSize)
            var i = 0
            while (i < n) { bb.putShort(fs(id, i).toShort); i += 1 }
            val bytes = bb.array()
            (id, if (id % 89 == 0) bytes.take(16) else bytes)
          }
        }
      }
      .toDF("doc_id", "wav")
  }

  /** D12g: REAL audio decode (`mm_audio_decode`) — the audio leg of
    * the modality triad, through the JVM's actual WAV codec
    * (`javax.sound.sampled.AudioSystem`: container parse, format
    * negotiation, frame extraction) in the same batched
    * partition-local stage as the PNG path. Published features are
    * what an audio curation pipeline gates on: duration, peak, RMS
    * energy, zero-crossing rate (the cheap voiced/unvoiced signal).
    * Gradable because the PCM signal is generated from a shared
    * exact-integer formula and WAV is lossless — a decoder that did
    * not really parse the RIFF container cannot pass; corrupt files
    * surface as `ok = false` rows, not task failures. Map-only at
    * 100 TB: encode+decode ride the scan, no shuffle before the
    * per-doc row.
    */
  def audioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    wavPayloads(spark, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, wav) =>
            val in =
              try javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(wav))
              catch { case _: Exception => null }
            if (in == null)
              AudioStats(id, ok = false, None, None, None, None, None, None, None)
            else {
              val fmt = in.getFormat
              val raw = in.readAllBytes()
              in.close()
              val ok = fmt.getChannels == 1 &&
                fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian
              if (!ok)
                AudioStats(id, ok = false, None, None, None, None, None, None, None)
              else {
                val n = raw.length / 2
                var ssq = 0L; var peak = 0L; var zc = 0L
                var prevNonNeg = false
                var i = 0
                while (i < n) {
                  val v = ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort.toLong
                  ssq += v * v
                  val a = math.abs(v)
                  if (a > peak) peak = a
                  val nonNeg = v >= 0
                  if (i > 0 && nonNeg != prevNonNeg) zc += 1
                  prevNonNeg = nonNeg
                  i += 1
                }
                AudioStats(id, ok = true,
                  Some(fmt.getSampleRate.toInt), Some(n.toLong),
                  Some(n.toLong * 1000000L / WavRate), Some(peak), Some(zc),
                  Some(ssq),
                  Some(BigDecimal(math.sqrt(ssq.toDouble / n.toDouble))
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
              }
            }
          }
        }
      }
      .toDF().orderBy("doc_id")
  }

  val audioDecodeSql: String =
    """WITH params AS (
      |  SELECT doc_id, CAST(n_chars % 300 + 100 AS INT) AS n,
      |    doc_id % 7 + 3 AS k
      |  FROM documents),
      |samp AS (
      |  SELECT doc_id, n, i,
      |    ((doc_id * 131 + i * k) % 65536) - 32768 AS v
      |  FROM params, range(0, 400) t(i) WHERE i < n),
      |st AS (
      |  SELECT doc_id, CAST(max(n) AS BIGINT) AS n_samples,
      |    CAST(sum(v * v) AS BIGINT) AS ssq,
      |    CAST(max(abs(v)) AS BIGINT) AS peak,
      |    CAST(sum(CASE WHEN prev IS NOT NULL
      |      AND ((v >= 0) <> (prev >= 0)) THEN 1 ELSE 0 END) AS BIGINT) AS zc
      |  FROM (SELECT *, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      |        FROM samp)
      |  GROUP BY doc_id)
      |SELECT p.doc_id, p.doc_id % 89 <> 0 AS ok,
      |  CASE WHEN p.doc_id % 89 = 0 THEN NULL ELSE 8000 END AS sample_rate,
      |  CASE WHEN p.doc_id % 89 = 0 THEN NULL ELSE s.n_samples END AS n_samples,
      |  CASE WHEN p.doc_id % 89 = 0 THEN NULL
      |       ELSE s.n_samples * 1000000 // 8000 END AS duration_us,
      |  CASE WHEN p.doc_id % 89 = 0 THEN NULL ELSE s.peak END AS peak,
      |  CASE WHEN p.doc_id % 89 = 0 THEN NULL ELSE s.zc END AS zc,
      |  CASE WHEN p.doc_id % 89 = 0 THEN NULL ELSE s.ssq END AS ssq,
      |  CASE WHEN p.doc_id % 89 = 0 THEN NULL
      |       ELSE round(sqrt(CAST(s.ssq AS DOUBLE) / CAST(s.n_samples AS DOUBLE)), 6)
      |  END AS rms_r
      |FROM params p JOIN st s USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_audio_decode" -> audioDecode _,
    "mm_image_histogram" -> imageHistogram _,
    "mm_phash_dedup" -> phashDedup _,
    "mm_decode_stats" -> decodeStats _,
    "mm_resize" -> resizeStats _,
    "mm_image_decode" -> imageDecode _,
    "mm_image_resize" -> imageResize _,
    "mm_frame_sample" -> frameSample _,
    "mm_binary_dedup" -> binaryDedup _)

  val oracleSql: Map[String, String] = Map(
    "mm_audio_decode" -> audioDecodeSql,
    "mm_image_histogram" -> imageHistogramSql,
    "mm_phash_dedup" -> phashDedupSql,
    "mm_binary_dedup" -> binaryDedupSql,
    "mm_image_decode" -> imageDecodeSql,
    "mm_image_resize" -> imageResizeSql,
    "mm_resize" ->
      """SELECT doc_id,
        |  CAST((length(text) + 3) // 4 AS BIGINT) AS resized_bytes,
        |  md5(array_to_string(list_transform(range(1, length(text) + 1, 4),
        |    i -> substring(text, i, 1)), '')) AS resized_md5,
        |  CAST(CAST(n_chars % 64 + 16 AS INT) // 2 AS INT) AS out_w,
        |  CAST(CAST(n_chars % 48 + 12 AS INT) // 2 AS INT) AS out_h
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id,
        |  CAST(length(text) // 64 AS BIGINT) AS n_frames,
        |  CAST(len(range(0, length(text) // 64, 4)) AS BIGINT) AS n_sampled,
        |  coalesce(array_to_string(list_transform(range(0, length(text) // 64, 4),
        |    f -> list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(f * 64 + 1, f * 64 + 65),
        |        i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
        |      (a, b) -> a + b)), ','), '') AS frame_sums
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_decode_stats" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, length(text) + 1),
        |        i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
        |    (acc, c) -> (acc + c) % 1000000007) AS checksum,
        |  CAST(len(list_filter(range(1, length(text) + 1),
        |    i -> ascii(substring(text, i, 1)) > 109)) AS BIGINT) AS n_hi,
        |  CAST(CAST(n_chars % 64 + 16 AS INT) AS DOUBLE) /
        |    CAST(n_chars % 48 + 12 AS INT) AS aspect
        |FROM documents ORDER BY doc_id""".stripMargin)
}
