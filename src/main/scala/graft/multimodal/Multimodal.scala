package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exprs

/** Multimodal columns: image/audio/video as opaque `binary` content plus a
  * typed metadata struct, with decode / feature-extract / frame-sample
  * plumbing (builder brief: the media codecs are not in this container, so
  * the decode kernel is a clearly-marked deterministic stub — the Spark-side
  * schema, batch shape, and partitioning behavior are real and tested).
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

  case class MediaMeta(width: Int, height: Int, durationMs: Int, codec: String)
  case class MediaRecord(mediaId: Long, kind: String, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(mediaId: Long, kind: String, nBytes: Int,
                           contentHash: String, brightness: Double)

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
