package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exprs

/** Multimodal columns: image/audio/video as opaque `binary` content plus a
  * typed metadata struct, with decode / feature-extract / frame-sample
  * plumbing. IMAGE decode is REAL — [[decodeImage]] runs `javax.imageio`
  * over actual PNG bytes ([[synthesizeImages]], q102; perceptual dedup
  * over decoded pixels, q119) — and AUDIO decode is REAL —
  * [[decodeAudio]] parses actual PCM WAVs through `javax.sound.sampled`
  * ([[synthesizeAudio]], q120) — each with [[decodeStub]]-style fallbacks
  * for unparseable blobs. For VIDEO the JDK has no codec-grade stack;
  * [[decodeAnimation]] (q121) round-trips a REAL multi-frame animation
  * container (animated GIF through ImageIO sequences) at the frame grain
  * q79's sampling contract consumes, and [[decodeStub]] remains the
  * labeled stand-in for codec video.
  *
  * Layout decisions that matter at 100 TB:
  *   - content is a single `binary` column → parquet keeps it out of the way
  *     of metadata-only scans (column pruning skips the blobs entirely);
  *     metadata predicates push down to row-group stats.
  *   - decode runs via `mapPartitions` on a typed Dataset — one JVM-side
  *     batch per partition, no shuffle (the plan keeps the upstream
  *     partitioning), mirroring a `mapInPandas` batch shape.
  *   - frame sampling is an `explode` of a lazily-generated index sequence —
  *     fan-out happens after partition-local filtering, never before.
  */
object Multimodal {

  // r21: ImageIO wraps every read/write stream in a DISK-backed cache by
  // default — each codec call creates (and deletes) a temp file, which
  // serializes 32 concurrent decode tasks on /tmp and made the parallel
  // pipelines SLOWER than single-task (q124 1.3 s → 4.5 s until this
  // line). All blobs here are in-memory byte arrays; the memory-backed
  // stream is strictly correct. Object-init runs wherever the decode
  // closures load (driver in local mode, executors on a cluster).
  javax.imageio.ImageIO.setUseCache(false)

  case class MediaMeta(width: Int, height: Int, durationMs: Int, codec: String)
  case class MediaRecord(mediaId: Long, kind: String, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(mediaId: Long, kind: String, nBytes: Int,
                           contentHash: String, brightness: Double)

  /** The id feed for the real-codec synthesis/decode pipelines (r21).
    * `documents.parquet` reads as ONE input split at test SFs (the file is
    * far below `maxPartitionBytes`), so every partition-local encode +
    * decode pass — the dominant cost of the whole multimodal family — ran
    * on a single core (measured: q119 7.4 s warm across 5 single-task
    * stages). The decode work must track the session's parallelism, not
    * the upstream table's file count: hash-repartition the BARE ids
    * (8 bytes/row — the guide-§8 lightweight proxy; the heavy media bytes
    * are synthesized/decoded AFTER the exchange, so they never shuffle).
    * Deterministic key (doc_id), never round-robin over synthesized rows
    * (guide §2.5 retry rule). Every downstream aggregate in the family is
    * integer/exact-dyadic arithmetic, so partition order cannot flip a
    * rounded emission (audited per query, OPTIMIZATION_r21.md). */
  private def mediaIds(spark: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Long] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
  }

  /** Deterministic media table derived from documents (content = utf8 text
    * bytes) — stands in for a real blob store at test scale. */
  def synthesize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (col("n_chars") % 1920).cast("int").as("width"),
        (col("n_chars") % 1080).cast("int").as("height"),
        (col("n_chars") * 40).cast("int").as("durationMs"),
        lit("stub").as("codec")).as("meta"))

  /** STUB decode kernel — stands in for an image/audio decoder (no codec
    * libs in this container). Deterministic: features derive only from the
    * bytes. A real implementation swaps the body, keeping the signature
    * (Iterator-to-Iterator, partition-local, zero shuffle). */
  def decodeStub(content: Array[Byte]): (String, Double) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hash = md.digest(content).map("%02x".format(_)).mkString
    // "brightness": mean unsigned byte value — a stand-in for a decoded-pixel stat
    val brightness = if (content.isEmpty) 0.0
      else content.map(b => (b & 0xff).toDouble).sum / content.length
    (hash, brightness)
  }

  /** Feature extraction over the media table: typed mapPartitions with an
    * Iterator→Iterator body (the mapInPandas batch shape). The partition
    * count and ordering of the input are preserved — `.explain` shows no
    * Exchange between the scan and this operator. */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id").as("mediaId"), col("kind"), col("content"), col("meta"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val (hash, brightness) = decodeStub(r.content)
          MediaFeatures(r.mediaId, r.kind, r.content.length, hash,
            math.rint(brightness * 10000) / 10000)
        }
      }
  }

  /** STUB resize: rewrites the metadata to the target box (aspect-preserving
    * fit) and re-stamps the content hash with the target dims — the real
    * implementation swaps the content transform, the metadata/schema contract
    * stays. Pure column expressions; content bytes pass through untouched. */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(targetW) / greatest(w, lit(1)).cast("double"),
      lit(targetH) / greatest(h, lit(1)).cast("double"))
    media
      .withColumn("meta", struct(
        (w * scale).cast("int").as("width"),
        (h * scale).cast("int").as("height"),
        col("meta.durationMs").as("durationMs"),
        concat(col("meta.codec"), lit("-resized")).as("codec")))
      .withColumn("resize_tag",
        md5(concat(col("content"), lit(s"${targetW}x$targetH"))))
  }

  /** Frame-sample plumbing: one output row per sampled frame index
    * (every `everyMs` of the metadata duration, at most `maxFrames` from the
    * start — the fixed per-item frame budget a vision-training pipeline
    * enforces), content untouched. The budget bounds the SEQUENCE ENDPOINT
    * (not a post-hoc slice), so the intermediate array — per-row allocation
    * and Spark's sequence length cap included — is O(maxFrames) regardless
    * of media duration. */
  def frameSample(media: DataFrame, everyMs: Int,
                  maxFrames: Int = Int.MaxValue): DataFrame = {
    // last sampled index is (maxFrames-1)*everyMs; clamp the cap so the
    // unbounded default can't overflow Int
    val capMs = math.min(everyMs.toLong * maxFrames - 1, Int.MaxValue.toLong).toInt
    media.withColumn("frame_ms",
        // zero-duration media has no frames — explode drops the empty array
        explode(when(col("meta.durationMs") > 0,
          sequence(lit(0),
            least(col("meta.durationMs") - 1, lit(capMs)), lit(everyMs)))
          .otherwise(array().cast("array<int>"))))
      .select(col("media_id"), col("kind"), col("frame_ms"))
  }

  /** q79: frame-sampling schedule accounting — per kind, how many media
    * items get frames, the total sampled-frame volume, how many items hit
    * the frame budget, and the mean frames per item. This is the row-count
    * contract for the downstream decode stage (each frame row becomes one
    * decode task), so it is oracle-checked even though the decode kernel
    * itself is stubbed.
    *
    * Scale shape: the bounded explode fans out at most `maxFrames` rows per
    * item partition-locally (no shuffle), then two hash aggregations
    * (media → kind) on aligned keys. */
  def q79FrameSample(spark: SparkSession, dir: String,
                     everyMs: Int = 500, maxFrames: Int = 32): DataFrame = {
    val frames = frameSample(synthesize(spark, dir), everyMs, maxFrames)
    val perItem = frames.groupBy(col("kind"), col("media_id")).agg(
      count(lit(1)).as("n"), max(col("frame_ms")).as("mx"))
    perItem.groupBy(col("kind")).agg(
        count(lit(1)).as("n_media"),
        sum(col("n")).as("n_frames"),
        count(when(col("n") === maxFrames, 1)).as("n_at_budget"),
        max(col("mx")).as("max_frame_ms"),
        Exprs.dround(sum(col("n")).cast("double") / count(lit(1)), 4)
          .as("avg_frames"))
      .orderBy(col("kind"))
  }

  /** Deterministic REAL image table: one row per document, content = an
    * actual PNG (constant gray g = doc_id % 256, dims 8+doc_id%16 ×
    * 8+doc_id%8), generated partition-locally with `ImageIO.write`. Every
    * 50th row is a deliberately corrupt 4-byte blob, so the decode
    * fallback path is exercised deterministically. Constant-fill +
    * lossless PNG means every decoded-pixel statistic is an arithmetic
    * function of doc_id — which is what lets a SQL oracle check a real
    * codec round-trip end-to-end. */
  def synthesizeImages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaIds(spark, dir)
      .mapPartitions { it =>
        it.map { id =>
          if (id % 50 == 0) (id, Array[Byte](0, 1, 2, 3))
          else {
            val g = (id % 256).toInt
            val w = 8 + (id % 16).toInt
            val h = 8 + (id % 8).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val rgb = (g << 16) | (g << 8) | g
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, bos.toByteArray)
          }
        }
      }.toDF("media_id", "content")
  }

  /** REAL image decode kernel: `javax.imageio.ImageIO` over the blob —
    * actual pixel width/height and mean RGB luminance — falling back to
    * [[decodeStub]]'s byte statistics (dims 0×0) when the blob doesn't
    * parse as an image. Returns (decoded, width, height, brightness). */
  def decodeImage(content: Array[Byte]): (Boolean, Int, Int, Double) = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Throwable => null }
    if (img == null) {
      val (_, b) = decodeStub(content)
      (false, 0, 0, b)
    } else {
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          x += 1
        }
        y += 1
      }
      (true, img.getWidth, img.getHeight,
        sum.toDouble / (img.getWidth.toLong * img.getHeight * 3))
    }
  }

  case class DecodedImage(mediaId: Long, decoded: Boolean, w: Int, h: Int,
                          brightness: Double, contentHash: String)

  /** q102: real-codec decode audit — the [[synthesizeImages]] PNGs go
    * through [[decodeImage]] in the same Iterator→Iterator mapPartitions
    * batch shape as [[extractFeatures]] (partition-local, zero shuffle),
    * then aggregate per doc_id-bucket: decode/fallback counts,
    * decoded-pixel brightness, decoded dimensions, distinct content
    * hashes. Because the generator fills each PNG with one gray level,
    * the decoded statistics are exactly computable in SQL (brightness =
    * g, dims = the generator's), so the oracle verifies the ImageIO
    * round-trip itself — a wrong pixel, a dropped row, or a fallback
    * misfire all flip the hash. Corrupt blobs land on the stub path:
    * brightness 1.5 (mean of bytes 0,1,2,3), dims 0. */
  def q102ImageDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = synthesizeImages(spark, dir)
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val hash = md.digest(bytes).map("%02x".format(_)).mkString
          md.reset()
          val (ok, w, h, b) = decodeImage(bytes)
          DecodedImage(id, ok, w, h, math.rint(b * 10000) / 10000, hash)
        }
      }
    feats.toDF()
      .groupBy((col("mediaId") % 4).as("bucket"))
      .agg(
        count(lit(1)).as("n_media"),
        count(when(col("decoded"), 1)).as("n_decoded"),
        count(when(!col("decoded"), 1)).as("n_fallback"),
        Exprs.dround(avg(col("brightness")), 4).as("avg_brightness"),
        sum(col("w")).as("sum_w"),
        sum(col("h")).as("sum_h"),
        countDistinct(col("contentHash")).as("n_distinct"))
      .orderBy(col("bucket"))
  }

  /** Deterministic PATTERN image table for perceptual dedup: 9×8 PNGs
    * whose gray level at (x, y) is an integer polynomial of
    * (doc_id, x, y) in [0, 190]; every 7th doc is replanted (id + 5e6)
    * with the SAME pattern shifted +20 gray levels — different bytes (an
    * exact byte/md5 dedup misses it), same gradient structure (a
    * difference hash catches it). No clipping (max 210 < 255) and PNG is
    * lossless, so decoded pixels reproduce the formula exactly — which is
    * what lets the SQL oracle check the codec round-trip AND the
    * perceptual-hash extraction end-to-end (the q102 trust structure). */
  def synthesizePatternImages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaIds(spark, dir)
      .flatMap(id =>
        if (id % 7 == 0) Seq((id, id, 0), (id + 5000000L, id, 20))
        else Seq((id, id, 0)))
      .mapPartitions { it =>
        it.map { case (mid, pid, shift) =>
          val img = new java.awt.image.BufferedImage(
            9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 9) {
              val v = (patternGray(pid, x, y) + shift).toInt
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (mid, bos.toByteArray)
        }
      }.toDF("media_id", "content")
  }

  /** The pattern polynomial — mirrored term-for-term by the q119 oracle's
    * generated SQL; keep both in sync. */
  private def patternGray(pid: Long, x: Int, y: Int): Long =
    (7L * x * x + 11L * y * x + 13L * y + pid * (x + y + 1)) % 191L

  /** q119: perceptual image near-dup dedup — the multimodal member of the
    * dedup family (the image-corpus analogue of q23/q25): a 63-bit
    * difference hash over DECODED pixels (bit = right neighbor brighter,
    * row-major, top bit dropped to keep the sum BIGINT-safe in both
    * engines), then duplicate = shares a hash with a lower media_id. A
    * dHash compares ADJACENT pixels, so a uniform brightness shift cancels
    * (a + c > b + c ⇔ a > b, clipping excluded by construction): the
    * planted +20-gray copies collide with their base with certainty while
    * their bytes and md5 differ — exactly the match class exact dedup
    * misses, provable recall 1.
    *
    * Scale shape: decode + hash are partition-local (Iterator→Iterator
    * mapPartitions, zero shuffle); the dup decision is one min-window
    * over the 8-byte hash key (the q106 one-partitioning trick) and the
    * rollup re-uses that exchange's output. The oracle recomputes the
    * hash bits from the pattern polynomial in pure SQL — a wrong decoded
    * pixel, a flipped comparison, or a missed planted collision all flip
    * the hash. */
  def q119ImageNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed = synthesizePatternImages(spark, dir)
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          var dh = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val bit = y * 8 + x
              if (bit < 63) {
                val a = img.getRGB(x, y) & 0xff
                val b = img.getRGB(x + 1, y) & 0xff
                if (b > a) dh |= 1L << bit
              }
              x += 1
            }
            y += 1
          }
          (id, dh)
        }
      }.toDF("media_id", "dhash")
    hashed
      .withColumn("first_id",
        min(col("media_id")).over(Window.partitionBy(col("dhash"))))
      .groupBy((col("media_id") % 4).as("bucket"))
      .agg(
        count(lit(1)).as("n_images"),
        count(when(col("media_id") >= 5000000L, 1)).as("n_planted"),
        count(when(col("media_id") > col("first_id"), 1)).as("n_dup_images"),
        countDistinct(col("dhash")).as("n_distinct_hashes"))
      .orderBy(col("bucket"))
  }

  /** q124: REAL image resize (nearest-neighbor thumbnail) over decoded
    * pixels — the pixel half of the resize operation ([[resizeStub]]
    * carries the metadata/box-policy half): decode the 9×8 pattern PNGs
    * and sample the exact floor grid `(sx, sy) = (3·x', 2·y')` down to a
    * 3×4 thumbnail. Decode + resample are one partition-local
    * Iterator→Iterator `mapPartitions` pass (zero shuffle — the q102/q119
    * batch shape); the only exchange is the 4-row bucket rollup. The audit
    * statistics are integers the oracle recomputes from the pattern
    * polynomial at the SAMPLED coordinates, so a wrong sample index, an
    * off-by-one in the grid, a codec error, or a dropped planted copy all
    * flip the driver hash. At 100 TB this is the thumbnail-materialization
    * pass of a multimodal ingest: embarrassingly parallel, no state, the
    * written thumbnail replacing the audit statistics. */
  def q124ImageResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val resized = synthesizePatternImages(spark, dir)
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          var sum = 0L
          var mx = 0L
          var yp = 0
          while (yp < 4) {
            var xp = 0
            while (xp < 3) {
              val v = (img.getRGB(3 * xp, 2 * yp) & 0xff).toLong
              sum += v
              if (v > mx) mx = v
              xp += 1
            }
            yp += 1
          }
          (id, sum, mx)
        }
      }.toDF("media_id", "resized_sum", "resized_max")
    resized
      .groupBy((col("media_id") % 4).as("bucket"))
      .agg(
        count(lit(1)).as("n_images"),
        count(when(col("media_id") >= 5000000L, 1)).as("n_planted"),
        sum(col("resized_sum")).as("total_resized"),
        max(col("resized_max")).as("max_px"),
        Exprs.dround(sum(col("resized_sum")) / (count(lit(1)) * lit(12.0)), 4)
          .as("avg_px"))
      .orderBy(col("bucket"))
  }

  /** q124 oracle terms, generated: the 12 sampled pattern-polynomial
    * pixels (plus the planted gray shift) as pure integer SQL. */
  private def resizedPxTerms(pid: String): Seq[String] =
    for (yp <- 0 until 4; xp <- 0 until 3) yield {
      val (sx, sy) = (3 * xp, 2 * yp)
      s"((7*$sx*$sx + 11*$sy*$sx + 13*$sy + $pid*(${sx + sy + 1})) % 191)"
    }

  /** q119 oracle, generated: the 63 comparison bits of the pattern
    * polynomial as one BIGINT sum — pure integer SQL, so the DuckDB side
    * needs no codec; equality proves the JVM decode + extraction chain. */
  private def dhashSqlExpr(pid: String): String = {
    def px(x: Int, y: Int) =
      s"((7*$x*$x + 11*$y*$x + 13*$y + $pid*($x+$y+1)) % 191)"
    val terms = for (y <- 0 until 8; x <- 0 until 8; if y * 8 + x < 63)
      yield s"(CASE WHEN ${px(x + 1, y)} > ${px(x, y)} THEN ${1L << (y * 8 + x)} ELSE 0 END)"
    terms.mkString("(", " + ", ")")
  }

  /** Deterministic REAL audio table: one row per document, content = an
    * actual PCM WAV (16-bit signed mono, 8 kHz) written through
    * `javax.sound.sampled.AudioSystem` — a real codec container, not a
    * byte stub. Sample i of doc pid is the integer ramp
    * `((i·(3 + pid%7) + pid) % 2001) − 1000`, n = 800 + pid%50 samples, so
    * every decoded-sample statistic is exact integer arithmetic in
    * (pid, i) — SQL-recomputable, the q102/q119 trust structure. Every
    * 50th row is a corrupt 4-byte blob exercising the fallback path. */
  def synthesizeAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r21: deliberately NOT mediaIds — measured BOTH ways: the
    // javax.sound.sampled registry (AudioSystem.write /
    // getAudioInputStream provider lookup) is lock-bound, and 32
    // concurrent decode tasks convoy on it (q120 0.8 s serial vs 2.3-3.6 s
    // parallel warm; q128 0.7 vs 1.7-4.5 s). The image pipelines
    // parallelize cleanly once ImageIO's disk cache is off; audio stays
    // on the scan's own partitioning until the WAV path stops funneling
    // through the shared registry.
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          if (id % 50 == 0) (id, Array[Byte](9, 9, 9, 9))
          else {
            val n = (800 + id % 50).toInt
            val pcm = new Array[Byte](n * 2)
            var i = 0
            while (i < n) {
              val s = (audioSample(id, i)).toShort
              pcm(2 * i) = (s & 0xff).toByte        // little-endian PCM
              pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
              i += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            (id, bos.toByteArray)
          }
        }
      }.toDF("media_id", "content")
  }

  /** The sample ramp — mirrored by the q120 oracle's SQL; keep in sync. */
  private def audioSample(pid: Long, i: Int): Long =
    ((i * (3 + pid % 7) + pid) % 2001L) - 1000L

  /** REAL audio decode: `AudioSystem.getAudioInputStream` over the blob —
    * parses the WAV container, reads the PCM frames back out and returns
    * (decoded, nSamples, sumAbsAmplitude, maxAmplitude); (false, 0, 0, 0)
    * when the blob isn't parseable audio. */
  def decodeAudio(content: Array[Byte]): (Boolean, Long, Long, Long) = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      catch { case _: Throwable => null }
    if (ais == null) (false, 0L, 0L, 0L)
    else {
      val bytes = ais.readAllBytes()
      var i = 0
      var n = 0L
      var sumAbs = 0L
      var maxAmp = Long.MinValue
      while (i + 2 <= bytes.length) {
        val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
        n += 1
        sumAbs += math.abs(s)
        if (s > maxAmp) maxAmp = s
        i += 2
      }
      (true, n, sumAbs, if (n == 0) 0L else maxAmp)
    }
  }

  /** The PCM samples back out of the WAV container, or None when the blob
    * isn't parseable audio — the sample-level form of [[decodeAudio]] for
    * feature extraction. */
  def decodeAudioSamples(content: Array[Byte]): Option[Array[Int]] = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      catch { case _: Throwable => null }
    if (ais == null) None
    else {
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
        i += 1
      }
      Some(out)
    }
  }

  /** q128: frame-level audio FEATURE EXTRACTION — the multimodal bullet's
    * extract member, one level below q120's whole-clip stats: decode the
    * real WAV container, cut the PCM into 20 ms frames (160 samples at the
    * synthetic 8 kHz rate, full frames only), and compute the two classic
    * integer-exact frame features — energy Σs² and strict zero crossings
    * (prev·s < 0) — rolled up per media bucket. All arithmetic is integer,
    * so the oracle recomputes the features from the generator formula
    * exactly (the q120 trust structure, extended from samples to frames).
    *
    * Scale shape: decode + framing are one partition-local
    * Iterator→Iterator pass emitting ONE row per media (frames never
    * become rows); the only shuffle is the 4-row bucket rollup. */
  def q128AudioFrameFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val FrameLen = 160
    val feats = synthesizeAudio(spark, dir)
      .select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeAudioSamples(bytes) match {
            case None => (id, false, 0L, 0L, 0L, 0L)
            case Some(s) =>
              val nFrames = s.length / FrameLen
              var f = 0; var sumE = 0L; var maxE = 0L; var zc = 0L
              while (f < nFrames) {
                var e = 0L
                var j = f * FrameLen
                val end = j + FrameLen
                var prev = 0
                var first = true
                while (j < end) {
                  val v = s(j)
                  e += v.toLong * v
                  if (!first && prev * v < 0) zc += 1
                  prev = v; first = false
                  j += 1
                }
                sumE += e
                if (e > maxE) maxE = e
                f += 1
              }
              (id, true, nFrames.toLong, sumE, maxE, zc)
          }
        }
      }.toDF("media_id", "decoded", "n_frames", "sum_energy",
        "max_frame_energy", "n_zero_cross")
    feats.groupBy((col("media_id") % 4).as("bucket"))
      .agg(
        count(when(col("decoded"), 1)).as("n_decoded"),
        sum(col("n_frames")).as("total_frames"),
        sum(col("sum_energy")).as("total_energy"),
        max(col("max_frame_energy")).as("max_frame_energy"),
        sum(col("n_zero_cross")).as("total_zero_cross"))
      .orderBy(col("bucket"))
  }

  /** q120: real audio-codec decode audit — the audio analogue of q102:
    * [[synthesizeAudio]] WAVs go through [[decodeAudio]] in the same
    * partition-local mapPartitions batch shape (zero shuffle before the
    * rollup), aggregated per doc_id-bucket: decode/fallback counts, total
    * decoded samples, exact integer amplitude sums and the max amplitude.
    * The oracle recomputes every statistic from the sample ramp with a
    * generate_series unnest — a dropped frame, an endianness slip, or a
    * header misparse all flip the hash. */
  def q120AudioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = synthesizeAudio(spark, dir)
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (ok, n, sumAbs, maxAmp) = decodeAudio(bytes)
          (id, ok, n, sumAbs, maxAmp)
        }
      }.toDF("media_id", "decoded", "n_samples", "sum_abs", "max_amp")
    feats
      .groupBy((col("media_id") % 4).as("bucket"))
      .agg(
        count(lit(1)).as("n_media"),
        count(when(col("decoded"), 1)).as("n_decoded"),
        count(when(!col("decoded"), 1)).as("n_fallback"),
        sum(col("n_samples")).as("total_samples"),
        sum(col("sum_abs")).as("total_abs_amplitude"),
        max(col("max_amp")).as("max_amplitude"))
      .orderBy(col("bucket"))
  }

  /** Deterministic REAL multi-frame animation table: one row per document,
    * content = an actual animated GIF (ImageIO write-sequence) with
    * 2 + pid%5 frames of 8×8 constant gray ((7·pid + 13·k) % 256 for
    * frame k) — constant-fill frames palette-encode losslessly, so every
    * decoded frame statistic is integer arithmetic in (pid, k). Not a
    * codec-grade video stack (none ships in the JDK), but a REAL container
    * round-trip — frame count and pixels come back from a parser, not a
    * byte stub. Every 50th row is corrupt for the fallback path. */
  def synthesizeAnimations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaIds(spark, dir)
      .mapPartitions { it =>
        it.map { id =>
          if (id % 50 == 0) (id, Array[Byte](7, 7, 7, 7))
          else {
            val bos = new java.io.ByteArrayOutputStream()
            val writer = javax.imageio.ImageIO
              .getImageWritersByFormatName("gif").next()
            val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            val n = (2 + id % 5).toInt
            var k = 0
            while (k < n) {
              val g = ((7 * id + 13 * k) % 256).toInt
              val img = new java.awt.image.BufferedImage(
                8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val rgb = (g << 16) | (g << 8) | g
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) { img.setRGB(x, y, rgb); x += 1 }
                y += 1
              }
              writer.writeToSequence(
                new javax.imageio.IIOImage(img, null, null), null)
              k += 1
            }
            writer.endWriteSequence()
            ios.close()
            writer.dispose()
            (id, bos.toByteArray)
          }
        }
      }.toDF("media_id", "content")
  }

  /** REAL animation decode: parse the GIF container, count frames and sum
    * the red channel over every pixel of every frame. Returns
    * (decoded, nFrames, redSum); (false, 0, 0) on unparseable blobs. */
  def decodeAnimation(content: Array[Byte]): (Boolean, Int, Long) = {
    try {
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content)))
      val n = reader.getNumImages(true)
      if (n <= 0) { reader.dispose(); (false, 0, 0L) }
      else {
        var redSum = 0L
        var k = 0
        while (k < n) {
          val img = reader.read(k)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              redSum += (img.getRGB(x, y) >> 16) & 0xff
              x += 1
            }
            y += 1
          }
          k += 1
        }
        reader.dispose()
        (true, n, redSum)
      }
    } catch { case _: Throwable => (false, 0, 0L) }
  }

  /** q121: real animation-container decode audit — retires the last
    * multimodal stub: [[synthesizeAnimations]] GIFs go through
    * [[decodeAnimation]] in the partition-local mapPartitions batch shape,
    * rolled up per doc_id-bucket with frame counts and exact integer
    * red-channel sums the oracle recomputes from the frame formula (64
    * pixels × gray per frame). A dropped frame, a palette distortion, or
    * a header misparse flips the hash; q79's sampling schedule is the
    * row-count contract downstream of exactly this frame grain. */
  def q121VideoDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = synthesizeAnimations(spark, dir)
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (ok, n, redSum) = decodeAnimation(bytes)
          (id, ok, n, redSum)
        }
      }.toDF("media_id", "decoded", "n_frames", "red_sum")
    feats
      .groupBy((col("media_id") % 4).as("bucket"))
      .agg(
        count(lit(1)).as("n_media"),
        count(when(col("decoded"), 1)).as("n_decoded"),
        count(when(!col("decoded"), 1)).as("n_fallback"),
        sum(col("n_frames")).cast("long").as("total_frames"),
        sum(col("red_sum")).as("total_red"),
        max(col("n_frames")).cast("long").as("max_frames"))
      .orderBy(col("bucket"))
  }

  /** q34: metadata + content stats per kind. The aggregation path uses pure
    * column expressions (octet_length/md5 — DuckDB-reproducible); the spec
    * asserts the mapPartitions decode path agrees with it row-for-row. */
  def q34MultimodalStats(spark: SparkSession, dir: String): DataFrame = {
    val m = synthesize(spark, dir)
    m.withColumn("n_bytes", octet_length(col("content")))
      .withColumn("content_hash", md5(col("content")))
      .groupBy(col("kind")).agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("content_hash")).as("n_distinct"),
        Exprs.dround(avg(col("meta.width").cast("double")), 4).as("avg_width"),
        max(col("meta.durationMs")).as("max_duration_ms"))
      .orderBy(col("kind"))
  }

  val oracle: Map[String, String] = Map(
    // Decoded frame counts/pixels are integer arithmetic in (doc_id, k)
    // because constant-fill frames palette-encode losslessly — see
    // q121VideoDecode (64 px per 8x8 frame).
    "q121_video_decode" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id FROM documents),
        |good AS (
        |  SELECT media_id, 2 + media_id % 5 AS n FROM media
        |  WHERE media_id % 50 <> 0),
        |frames AS (
        |  SELECT g.media_id, (7 * g.media_id + 13 * k) % 256 AS gray
        |  FROM good g, LATERAL (SELECT unnest(generate_series(0, g.n - 1)) AS k)),
        |per AS (
        |  SELECT media_id, count(*) AS n_frames,
        |    (64 * sum(gray))::BIGINT AS red_sum, true AS decoded
        |  FROM frames GROUP BY media_id
        |  UNION ALL
        |  SELECT media_id, 0, 0, false FROM media WHERE media_id % 50 = 0)
        |SELECT media_id % 4 AS bucket, count(*) AS n_media,
        |  count(CASE WHEN decoded THEN 1 END) AS n_decoded,
        |  count(CASE WHEN NOT decoded THEN 1 END) AS n_fallback,
        |  sum(n_frames)::BIGINT AS total_frames,
        |  sum(red_sum)::BIGINT AS total_red,
        |  max(n_frames)::BIGINT AS max_frames
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    // Decoded-sample stats are exact integer arithmetic in (doc_id, i)
    // because the generator writes the ramp through a lossless PCM WAV —
    // frame features from the generator formula — frames of 160, energy
    // and strict zero crossings in pure integer arithmetic; undecodable
    // media (id % 50 = 0) contribute zero rows here and zero counts there
    "q128_audio_frame_features" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id FROM documents),
        |good AS (
        |  SELECT media_id, 800 + media_id % 50 AS n, 3 + media_id % 7 AS step
        |  FROM media WHERE media_id % 50 <> 0),
        |samples AS (
        |  SELECT g.media_id, i, ((i * g.step + g.media_id) % 2001) - 1000 AS s
        |  FROM good g, LATERAL (SELECT unnest(generate_series(0, g.n - 1)) AS i)
        |  WHERE i < (g.n // 160) * 160),
        |lagged AS (
        |  SELECT media_id, i // 160 AS frame, s,
        |    lag(s) OVER (PARTITION BY media_id, i // 160 ORDER BY i) AS prev
        |  FROM samples),
        |frames AS (
        |  SELECT media_id, frame, sum(s * s)::BIGINT AS energy,
        |    count(CASE WHEN prev * s < 0 THEN 1 END) AS zc
        |  FROM lagged GROUP BY 1, 2),
        |per AS (
        |  SELECT media_id, count(*) AS n_frames,
        |    sum(energy)::BIGINT AS sum_energy, max(energy) AS max_frame_energy,
        |    sum(zc)::BIGINT AS n_zero_cross
        |  FROM frames GROUP BY media_id)
        |SELECT media_id % 4 AS bucket,
        |  count(*) AS n_decoded,
        |  sum(n_frames)::BIGINT AS total_frames,
        |  sum(sum_energy)::BIGINT AS total_energy,
        |  max(max_frame_energy) AS max_frame_energy,
        |  sum(n_zero_cross)::BIGINT AS total_zero_cross
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    // see q120AudioDecode.
    "q120_audio_decode" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id FROM documents),
        |good AS (
        |  SELECT media_id, 800 + media_id % 50 AS n, 3 + media_id % 7 AS step
        |  FROM media WHERE media_id % 50 <> 0),
        |samples AS (
        |  SELECT g.media_id, ((i * g.step + g.media_id) % 2001) - 1000 AS s
        |  FROM good g, LATERAL (SELECT unnest(generate_series(0, g.n - 1)) AS i)),
        |per AS (
        |  SELECT media_id, count(*) AS n_samples, sum(abs(s))::BIGINT AS sum_abs,
        |    max(s)::BIGINT AS max_amp, true AS decoded
        |  FROM samples GROUP BY media_id
        |  UNION ALL
        |  SELECT media_id, 0, 0, 0, false FROM media WHERE media_id % 50 = 0)
        |SELECT media_id % 4 AS bucket, count(*) AS n_media,
        |  count(CASE WHEN decoded THEN 1 END) AS n_decoded,
        |  count(CASE WHEN NOT decoded THEN 1 END) AS n_fallback,
        |  sum(n_samples)::BIGINT AS total_samples,
        |  sum(sum_abs)::BIGINT AS total_abs_amplitude,
        |  max(max_amp) AS max_amplitude
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q124_image_resize" ->
      s"""WITH ids AS (
        |  SELECT doc_id AS media_id, doc_id AS pid, 0 AS shift FROM documents
        |  UNION ALL
        |  SELECT doc_id + 5000000, doc_id, 20 FROM documents
        |  WHERE doc_id % 7 = 0),
        |per AS (
        |  SELECT media_id,
        |    (${resizedPxTerms("pid").mkString(" + ")} + 12 * shift)
        |      AS resized_sum,
        |    (greatest(${resizedPxTerms("pid").mkString(", ")}) + shift)
        |      AS resized_max
        |  FROM ids)
        |SELECT media_id % 4 AS bucket, count(*) AS n_images,
        |  count(CASE WHEN media_id >= 5000000 THEN 1 END) AS n_planted,
        |  sum(resized_sum)::BIGINT AS total_resized,
        |  max(resized_max)::BIGINT AS max_px,
        |  round(sum(resized_sum)::DOUBLE / (count(*) * 12.0) * 10000) / 10000
        |    AS avg_px
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q119_image_neardup" ->
      s"""WITH ids AS (
        |  SELECT doc_id AS media_id, doc_id AS pid FROM documents
        |  UNION ALL
        |  SELECT doc_id + 5000000, doc_id FROM documents WHERE doc_id % 7 = 0),
        |hashes AS (
        |  SELECT media_id, ${dhashSqlExpr("pid")} AS dh
        |  FROM ids),
        |flagged AS (
        |  SELECT media_id, dh,
        |    min(media_id) OVER (PARTITION BY dh) AS first_id
        |  FROM hashes)
        |SELECT media_id % 4 AS bucket, count(*) AS n_images,
        |  count(CASE WHEN media_id >= 5000000 THEN 1 END) AS n_planted,
        |  count(CASE WHEN media_id > first_id THEN 1 END) AS n_dup_images,
        |  count(DISTINCT dh) AS n_distinct_hashes
        |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin,
    // Decoded-pixel stats are arithmetic in doc_id because the generator
    // fills each lossless PNG with one gray level — see q102ImageDecode.
    "q102_image_decode" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |    doc_id % 50 = 0 AS corrupt,
        |    (doc_id % 256)::INT AS g,
        |    (8 + doc_id % 16)::INT AS w,
        |    (8 + doc_id % 8)::INT AS h
        |  FROM documents),
        |feat AS (
        |  SELECT media_id, media_id % 4 AS bucket,
        |    NOT corrupt AS decoded,
        |    CASE WHEN corrupt THEN 0 ELSE w END AS dw,
        |    CASE WHEN corrupt THEN 0 ELSE h END AS dh,
        |    CASE WHEN corrupt THEN 1.5 ELSE g::DOUBLE END AS brightness,
        |    CASE WHEN corrupt THEN 'corrupt'
        |         ELSE g::VARCHAR || 'x' || w::VARCHAR || 'x' || h::VARCHAR
        |    END AS sig
        |  FROM img)
        |SELECT bucket, count(*) AS n_media,
        |  count(CASE WHEN decoded THEN 1 END) AS n_decoded,
        |  count(CASE WHEN NOT decoded THEN 1 END) AS n_fallback,
        |  round(avg(brightness) * 10000) / 10000 AS avg_brightness,
        |  sum(dw)::BIGINT AS sum_w, sum(dh)::BIGINT AS sum_h,
        |  count(DISTINCT sig) AS n_distinct
        |FROM feat GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q79_frame_sample" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id,
        |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
        |    (n_chars * 40)::INT AS duration_ms
        |  FROM documents),
        |frames AS (
        |  -- step-500 series from 0; the 32-frame budget == frame_ms < 500*32
        |  SELECT media_id, kind, f AS frame_ms
        |  FROM media, LATERAL (SELECT unnest(generate_series(0, duration_ms - 1, 500)) AS f)
        |  WHERE duration_ms > 0 AND f < 500 * 32),
        |per_item AS (
        |  SELECT kind, media_id, count(*) AS n, max(frame_ms) AS mx
        |  FROM frames GROUP BY kind, media_id)
        |SELECT kind, count(*) AS n_media, sum(n)::BIGINT AS n_frames,
        |  count(CASE WHEN n = 32 THEN 1 END) AS n_at_budget,
        |  max(mx)::INT AS max_frame_ms,  -- Spark sequence() of INTs → INT; DuckDB generate_series → BIGINT

        |  round(sum(n)::BIGINT::DOUBLE / count(*) * 10000) / 10000 AS avg_frames
        |FROM per_item GROUP BY kind ORDER BY kind""".stripMargin,

    "q34_multimodal_stats" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id,
        |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
        |    text AS content,  -- blob = utf8(text); DuckDB md5/octet_length read the same bytes via VARCHAR
        |    (n_chars % 1920)::INT AS width,
        |    (n_chars * 40)::INT AS duration_ms
        |  FROM documents)
        |SELECT kind, count(*) AS n_media,
        |  sum(octet_length(encode(content)))::BIGINT AS total_bytes,
        |  count(DISTINCT md5(content)) AS n_distinct,
        |  round(avg(width::DOUBLE), 4) AS avg_width,
        |  max(duration_ms) AS max_duration_ms
        |FROM media GROUP BY kind ORDER BY kind""".stripMargin,
  )
}
