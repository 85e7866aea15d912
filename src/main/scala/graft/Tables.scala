package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * All readers take the scale-factor directory so the same query code runs at
  * sf0.001 (smoke), sf0.01 (DuckDB-oracle correctness) and sf0.1 (bench) — and,
  * unchanged, against a cluster-scale partitioned layout (the path is just a
  * parquet directory; partition discovery & pruning are native).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")

  /** Documents with `doc_id`/`n_chars` NORMALIZED to long — the encoding-
    * drift insurance the ts/embedding loaders carry (r6 lesson): a pandas
    * producer can downcast the int64 ids to int32 (and ship large_string /
    * dictionary-encoded text, which Spark absorbs natively), and every
    * `getLong(doc_id)` consumer and committed-id arithmetic (`doc_id % k`
    * plants, cluster labels) assumes 64-bit. No-op casts on the current
    * data (Catalyst SimplifyCasts); pinned by DocumentsEncodingSpec. */
  def documents(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "documents")
      .withColumn("doc_id", col("doc_id").cast("long"))
    // n_chars is part of the driver schema but absent from some spec
    // fixtures — normalize only when present
    if (raw.columns.contains("n_chars"))
      raw.withColumn("n_chars", col("n_chars").cast("long"))
    else raw
  }

  /** Embeddings with the vector column NORMALIZED to `array<float>` — the
    * same producer-drift insurance [[events]] carries for timestamps
    * (round 6 lost 62 queries to an encoding flip): every consumer
    * (`getSeq[Float]` probe collects, the cosine/hyperplane kernels' typed
    * fast paths) assumes float32, and a regeneration that ships float64
    * would otherwise fail at runtime across the whole similarity family.
    * The float32 case is a no-op (no cast node at all); any OTHER stored
    * type still gets the survival cast but is made LOUD, because the
    * narrowing changes what precision-sensitive similarity oracles see
    * versus the raw column DuckDB reads (r8 advice: never narrow
    * silently). */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "embeddings")
      .withColumn("vec_id", col("vec_id").cast("long")) // getLong contract
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case other =>
        System.err.println(
          s"[graft.Tables] embeddings.embedding stored as $other, not " +
            "array<float> — casting (narrowing!) so getSeq[Float] consumers " +
            "survive; re-check precision-sensitive similarity oracles " +
            "against the raw column before trusting a red hash")
        raw.withColumn("embedding", col("embedding").cast("array<float>"))
    }
  }

  /** Deterministic synthetic coordinates for the geo operators (q20/q30-q32):
    * lat = value - 50 ∈ [-50, 50], lon = 3.6·k - 180 ∈ [-180, 176.4]. ONE
    * source for the formula — the oracle SQL strings replicate it verbatim,
    * and the stuck/teleport thresholds are tuned against this grid. */
  def withSyntheticPositions(df: DataFrame): DataFrame = df
    .withColumn("lat", col("value") - 50)
    .withColumn("lon",
      get_json_object(col("props"), "$.k").cast("int") * lit(3.6) - 180)

  /** `events.parquet` has shipped with TWO physical encodings of `ts` across
    * driver regenerations — TIMESTAMP(NANOS) (read as a plain long under the
    * legacy nanosAsLong conf) and TIMESTAMP(isAdjustedToUTC=false, MICROS)
    * (read as TIMESTAMP_NTZ). Producers drift; the loader must absorb that
    * (the reference's converter re-infers arrow types per batch for the same
    * reason — src/lambda/etl/optimized_converter.py:417-466). We branch on the
    * dtype Spark actually read and expose BOTH, identically in either case:
    *   - `ts_ns`: exact epoch-nanos long (DuckDB parity: `epoch_ns(ts)` —
    *     micros data is micro-precision, so micros*1000 is exact)
    *   - `ts`:    micro-precision TimestampType for date_trunc/date_format
    * Session TZ is pinned UTC before touching an NTZ value so the NTZ→instant
    * cast is the identity DuckDB also applies.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    deriveEventTs(table(spark, dir, "events"))
  }

  private def deriveEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long encoding
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case org.apache.spark.sql.types.TimestampType =>
        raw
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case _ => // TIMESTAMP_NTZ: UTC-cast to an instant first (TZ pinned above)
        raw
          .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }

  /** Time-windowed events load, `[fromS, untilS)` in epoch SECONDS.
    *
    * Because `ts_ns` is DERIVED under the micros encodings (`unix_micros(ts)
    * *1000`), a `ts_ns >= X` filter applied after [[events]] cannot reach the
    * parquet scan — Catalyst pushes predicates on attributes, not on derived
    * expressions. Any query whose whole point at 100 TB is "read one hour,
    * not the corpus" (dashboards q53/q54, hour-partitioned sinks) must route
    * the bound through here: the predicate is applied to the RAW physical
    * `ts` column, in that column's own type, BEFORE derivation, so it lands
    * in PushedFilters (and prunes hour partitions/row groups) under every
    * encoding the producer has shipped. */
  def eventsInRange(spark: SparkSession, dir: String,
                    fromS: Option[Long], untilS: Option[Long]): DataFrame = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    def bound(s: Long): Column = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => lit(s * 1000000000L)
      case org.apache.spark.sql.types.TimestampType =>
        lit(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)))
      case _ =>
        lit(java.time.LocalDateTime.ofEpochSecond(s, 0, java.time.ZoneOffset.UTC))
    }
    val lo = fromS.map(s => col("ts") >= bound(s))
    val hi = untilS.map(s => col("ts") < bound(s))
    deriveEventTs((lo.toSeq ++ hi).foldLeft(raw)(_.filter(_)))
  }
}
