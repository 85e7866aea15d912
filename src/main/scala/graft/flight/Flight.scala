package graft.flight

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.Exprs

/** Flight-domain ETL: the reference's ingestion → enrichment surface
  * (SURVEY.md §2.1 S9, §2.2 P1/P2/P6, §2.8 CASE ladders).
  *
  * Raw model: one OpenSky `/states/all` response per JSON file —
  * `{time, states: [[17 positional fields], ...]}` (reference
  * `src/lambda/data_ingestion/flight_data_ingestion.py:270-333`, raw DDL
  * `sql/athena/02_create_raw_tables.sql:15-37`). The positional array is
  * heterogeneous, so we read `states` as `array<array<string>>` (Spark's
  * JSON reader stringifies scalars losslessly) and cast per position.
  *
  * Python-truthiness quirks of the reference are mirrored deliberately:
  * `baro_altitude == 0.0` produces NULL `baro_altitude_ft` (`if baro_altitude`
  * is falsy on 0.0 — flight_data_ingestion.py:311), same for velocity.
  */
object Flight {

  val rawSchema: StructType = StructType(Seq(
    StructField("time", LongType),
    StructField("states", ArrayType(ArrayType(StringType)))))

  /** Read raw landing-zone JSON (one API response per file). */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(rawSchema).json(path)

  /** S10: permissive read with a corrupt-record side channel. Returns
    * (good, bad): syntactically broken files land in `bad` with their raw
    * text preserved — the DLQ shape (reference error_recovery.py:399-597) as
    * a second DataFrame the caller writes to an `_errors` sink instead of a
    * queue.
    *
    * Two independent scans, no materialization: the good side is a
    * DROPMALFORMED json read (streams at any corpus size); the bad side
    * re-reads the raw lines as text and keeps those `from_json` cannot
    * parse. The previous single-scan + `cache()` version pinned the entire
    * raw corpus in executor storage to serve both splits — at 100 TB that
    * is strictly worse than a second pass over the (tiny, by construction)
    * corrupt fraction's input. */
  def readRawWithErrors(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val good = spark.read
      .schema(rawSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)
    // from_json never returns null in PERMISSIVE mode — malformed input
    // surfaces through the corrupt-record column of the parse schema
    // (the file-source restriction on querying _corrupt_record does not
    // apply to from_json over a text scan)
    val parseSchema = rawSchema.add(StructField("_corrupt_record", StringType))
    val bad = spark.read.text(path)
      .withColumn("source_file", input_file_name())
      .filter(col("value").isNotNull && length(trim(col("value"))) > 0)
      .withColumn("parsed", from_json(col("value"), parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")))
      .filter(col("parsed._corrupt_record").isNotNull)
      .select(col("value").as("raw"), col("source_file"))
    (good, bad)
  }

  /** S10 DLQ replay (reference `error_recovery.py:399-597`,
    * `process_dlq_records` + the retry-strategy ladder): run the captured
    * corrupt records through a CONSTANT ladder of deterministic fix-up
    * strategies, re-parse after each, and split into (recovered, dead).
    *
    * Each attempt is a pure column transform + `from_json` over the bad
    * side — one scan per strategy, no driver-side iteration over records,
    * so replay cost is O(strategies × |DLQ|), and the DLQ is tiny by
    * construction. Dead records carry the reference's error classification
    * (`ErrorClassifier.classify_error`, :266-310) and the attempt count.
    *
    * Returns (recovered: raw/source_file/fixed_raw/strategy/attempt +
    * parsed payload, dead: raw/source_file/error_type/attempts). */
  def reprocessErrors(bad: DataFrame): (DataFrame, DataFrame) = {
    val parseSchema = rawSchema.add(StructField("_corrupt_record", StringType))
    val strategies: Seq[(String, Column => Column)] = Seq(
      // transient-failure analog: parse again unchanged
      "as_is_retry" -> identity,
      // common producer bug: trailing comma before a closing bracket
      "strip_trailing_commas" ->
        (c => regexp_replace(c, ",\\s*([\\]\\}])", "$1")),
      // salvage the outermost JSON object from surrounding garbage
      "extract_json_object" -> (c => regexp_extract(c, "(\\{.*\\})", 1)))
    val empty = bad.sparkSession.emptyDataFrame
    val (recoveredOpt, remaining) =
      strategies.zipWithIndex.foldLeft(
        (Option.empty[DataFrame], bad)) {
        case ((acc, rem), ((name, fix), i)) =>
          val fixed = rem.withColumn("fixed_raw", fix(col("raw")))
            .withColumn("parsed", from_json(col("fixed_raw"), parseSchema,
              Map("mode" -> "PERMISSIVE",
                "columnNameOfCorruptRecord" -> "_corrupt_record")))
          val ok = col("parsed").isNotNull &&
            col("parsed._corrupt_record").isNull &&
            col("parsed.states").isNotNull
          val rec = fixed.filter(ok)
            .select(col("raw"), col("source_file"), col("fixed_raw"),
              lit(name).as("strategy"), lit(i + 1).as("attempt"),
              col("parsed.time").as("time"), col("parsed.states").as("states"))
          val next = fixed.filter(!ok).drop("fixed_raw", "parsed")
          (Some(acc.fold(rec)(_.unionByName(rec))), next)
      }
    val dead = remaining
      .withColumn("error_type",
        when(!col("raw").rlike("^\\s*\\{"), "NOT_JSON")
          .when(!col("raw").rlike("\\}\\s*$"), "TRUNCATED")
          .otherwise("PARSE_ERROR"))
      .withColumn("attempts", lit(strategies.size))
    (recoveredOpt.getOrElse(empty), dead)
  }

  private val fieldNames = Seq(
    "icao24", "callsign", "origin_country", "time_position", "last_contact",
    "longitude", "latitude", "baro_altitude", "on_ground", "velocity",
    "true_track", "vertical_rate", "sensors", "geo_altitude", "squawk",
    "spi", "position_source")

  private val fieldTypes = Map(
    "time_position" -> "long", "last_contact" -> "long",
    "longitude" -> "double", "latitude" -> "double",
    "baro_altitude" -> "double", "velocity" -> "double",
    "true_track" -> "double", "vertical_rate" -> "double",
    "geo_altitude" -> "double", "on_ground" -> "boolean",
    "spi" -> "boolean", "position_source" -> "int")

  /** S9 + P6: explode the state array into one validated row per aircraft.
    * Structural validation drops states shorter than 17 elements or with a
    * null/empty icao24 (reference :272-298). */
  def explodeStates(raw: DataFrame): DataFrame = {
    val cols = fieldNames.zipWithIndex.map { case (n, i) =>
      val c = element_at(col("state"), i + 1)
      fieldTypes.get(n).fold(c)(t => c.cast(t)).as(n)
    }
    raw.select(col("time").as("collection_time"), explode(col("states")).as("state"))
      .filter(size(col("state")) >= 17)
      .select(col("collection_time") +: cols: _*)
      .filter(col("icao24").isNotNull && col("icao24") =!= "")
  }

  /** Python-truthiness conversion: null when the source is null OR zero. */
  private def truthyConv(c: Column, factor: Double): Column =
    when(c.isNotNull && c =!= 0, round(c * factor, 2))

  /** P1 + P2 + business rules 5/6: unit conversions, presence flags,
    * callsign normalization, airline code, geographic region
    * (reference flight_data_ingestion.py:300-325,
    * flight_data_processor.py:155-180). */
  def enrich(df: DataFrame): DataFrame = df
    .withColumn("baro_altitude_ft", truthyConv(col("baro_altitude"), 3.28084))
    .withColumn("geo_altitude_ft", truthyConv(col("geo_altitude"), 3.28084))
    .withColumn("velocity_knots", truthyConv(col("velocity"), 1.94384))
    .withColumn("vertical_rate_fpm",
      when(col("vertical_rate").isNotNull, round(col("vertical_rate") * 196.85, 2)))
    .withColumn("has_position", col("longitude").isNotNull && col("latitude").isNotNull)
    .withColumn("has_altitude", col("baro_altitude").isNotNull || col("geo_altitude").isNotNull)
    .withColumn("has_velocity", col("velocity").isNotNull)
    .withColumn("callsign_normalized",
      when(col("callsign").isNotNull && trim(col("callsign")) =!= "",
        upper(trim(col("callsign")))))
    .withColumn("airline_code",
      when(length(trim(col("callsign"))) >= 3, substring(trim(col("callsign")), 1, 3)))
    .withColumn("region", regionOf(col("longitude"), col("latitude")))

  /** Q3 validity formats (reference quality_validator.py:66-74,334-522):
    * icao24 is 6 lowercase hex chars; squawk is 4 octal digits; coordinates
    * must be finite and in range; altitude/velocity/vrate sane. All
    * null-safe (null → false, the validator's failed-check semantics). */
  def icao24Valid(c: Column): Column =
    coalesce(c.rlike("^[0-9a-f]{6}$"), lit(false))

  def squawkValid(c: Column): Column =
    coalesce(c.rlike("^[0-7]{4}$"), lit(false))

  def coordsValid(lon: Column, lat: Column): Column =
    coalesce(lon.between(-180, 180) && lat.between(-90, 90) &&
      !isnan(lon) && !isnan(lat), lit(false))

  def altitudeFtValid(altFt: Column): Column =
    coalesce(altFt.between(-1000, 60000), lit(false))

  def velocityKnValid(kn: Column): Column =
    coalesce(kn.between(0, 800), lit(false))

  def verticalRateFpmValid(fpm: Column): Column =
    coalesce(abs(fpm) <= 8000, lit(false))

  /** Geographic region CASE (reference flight_data_processor.py:166-179). */
  def regionOf(lon: Column, lat: Column): Column =
    when(lon.isNull || lat.isNull, "UNKNOWN")
      .when(lon.between(-125, -66) && lat.between(20, 72), "NORTH_AMERICA")
      .when(lon.between(-15, 55) && lat.between(35, 70), "EUROPE")
      .when(lon.between(95, 145) && lat.between(-45, 20), "ASIA_PACIFIC")
      .otherwise("OTHER")

  /** Altitude bands (reference flight_data_processor.py:89-101). */
  def altitudeCategory(altFt: Column): Column =
    when(altFt.isNull, "UNKNOWN")
      .when(altFt < 1000, "LOW")
      .when(altFt < 18000, "MEDIUM")
      .when(altFt < 35000, "HIGH")
      .otherwise("VERY_HIGH")

  /** Speed bands (reference flight_data_processor.py:103-117). */
  def speedCategory(kn: Column): Column =
    when(kn.isNull, "UNKNOWN")
      .when(kn < 50, "SLOW")
      .when(kn < 200, "TAXI")
      .when(kn < 400, "APPROACH")
      .when(kn < 600, "CRUISE")
      .otherwise("HIGH_SPEED")

  /** Flight-phase truth table (reference data_transformer.py:523-588):
    * NaN/null inputs coalesce to 0, ground is alt ≤ 100 ft split by speed
    * (≤5 GROUND, ≤30 TAXI, else TAKEOFF), airborne by climb rate then
    * altitude/speed. */
  def flightPhase(altFt: Column, speedKn: Column, climbFpm: Column): Column = {
    val alt = coalesce(altFt, lit(0.0))
    val spd = coalesce(speedKn, lit(0.0))
    val clm = coalesce(climbFpm, lit(0.0))
    when(alt <= 100,
      when(spd <= 5, "GROUND").when(spd <= 30, "TAXI").otherwise("TAKEOFF"))
      .when(clm >= 500, when(alt < 3000, "TAKEOFF").otherwise("CLIMB"))
      .when(clm <= -300, when(alt < 3000, "APPROACH").otherwise("DESCENT"))
      .when(alt >= 10000, "CRUISE")
      .when(spd < 150, "APPROACH")
      .otherwise("CRUISE")
  }

  /** The processor's coarser phase estimate (reference
    * flight_data_processor.py:119-145), incl. its Python-truthiness reading
    * of vertical_rate (0 fpm is "no rate"). */
  def estimatedPhase(onGround: Column, altFt: Column, speedKn: Column,
                     vrate: Column): Column =
    when(onGround, "GROUND")
      .when(altFt.isNull || speedKn.isNull || altFt === 0 || speedKn === 0, "UNKNOWN")
      .when(altFt < 1000,
        when(vrate.isNotNull && vrate > 0, "TAKEOFF")
          .when(vrate.isNotNull && vrate < 0, "LANDING")
          .otherwise("LOW_ALTITUDE"))
      .when(altFt > 25000 && speedKn > 300, "CRUISE")
      .when(vrate.isNotNull && vrate > 500, "CLIMB")
      .when(vrate.isNotNull && vrate < -500, "DESCENT")
      .otherwise("LEVEL_FLIGHT")

  /** Full ingestion pipeline: raw JSON dir → validated, enriched, categorized
    * frame ready for the partitioned sink. */
  def ingest(spark: SparkSession, rawPath: String): DataFrame = {
    val e = enrich(explodeStates(readRaw(spark, rawPath)))
    e.withColumn("altitude_category",
        altitudeCategory(coalesce(col("baro_altitude_ft"), col("geo_altitude_ft"))))
      .withColumn("speed_category", speedCategory(col("velocity_knots")))
      .withColumn("flight_phase", flightPhase(
        coalesce(col("baro_altitude_ft"), col("geo_altitude_ft")),
        col("velocity_knots"), col("vertical_rate_fpm")))
  }

  /** S5: hour-partitioned parquet sink (year=/month=/day=/hour=). */
  def writePartitioned(df: DataFrame, outDir: String): Unit = {
    val ts = to_timestamp(col("collection_time"))
    df.withColumn("year", year(ts)).withColumn("month", month(ts))
      .withColumn("day", dayofmonth(ts)).withColumn("hour", hour(ts))
      .write.mode("append")
      // S4 writer layout (reference 03:112-116): snappy + dictionary encoding,
      // 128 MB row groups so one group ≈ one task read at scale
      .option("compression", "snappy")
      .option("parquet.block.size", (128 * 1024 * 1024).toString)
      .partitionBy("year", "month", "day", "hour")
      .parquet(outDir)
  }

  /** q33: the category/phase ladders applied to pseudo-telemetry derived
    * deterministically from events (alt = 600·value ft, speed = 6·k kn,
    * climb = 25·(value-50) fpm) — DuckDB-checked truth-table-at-scale. */
  def q33FlightEnrich(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("alt_ft", col("value") * 600)
      .withColumn("speed_kn", get_json_object(col("props"), "$.k").cast("int") * lit(6.0))
      .withColumn("climb_fpm", (col("value") - 50) * 25)
    e.withColumn("altitude_category", altitudeCategory(col("alt_ft")))
      .withColumn("speed_category", speedCategory(col("speed_kn")))
      .withColumn("flight_phase", flightPhase(col("alt_ft"), col("speed_kn"), col("climb_fpm")))
      .groupBy(col("altitude_category"), col("speed_category"), col("flight_phase"))
      .agg(count(lit(1)).as("n"),
        Exprs.avgExact2(col("value"), 4).as("avg_value"))
      .orderBy(col("altitude_category"), col("speed_category"), col("flight_phase"))
  }

  val oracle: Map[String, String] = Map(
    "q33_flight_enrich" ->
      """WITH telem AS (
        |  SELECT value, value * 600 AS alt_ft,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) * 6.0 AS speed_kn,
        |    (value - 50) * 25 AS climb_fpm
        |  FROM events),
        |cat AS (
        |  SELECT value,
        |    CASE WHEN alt_ft IS NULL THEN 'UNKNOWN'
        |         WHEN alt_ft < 1000 THEN 'LOW'
        |         WHEN alt_ft < 18000 THEN 'MEDIUM'
        |         WHEN alt_ft < 35000 THEN 'HIGH'
        |         ELSE 'VERY_HIGH' END AS altitude_category,
        |    CASE WHEN speed_kn IS NULL THEN 'UNKNOWN'
        |         WHEN speed_kn < 50 THEN 'SLOW'
        |         WHEN speed_kn < 200 THEN 'TAXI'
        |         WHEN speed_kn < 400 THEN 'APPROACH'
        |         WHEN speed_kn < 600 THEN 'CRUISE'
        |         ELSE 'HIGH_SPEED' END AS speed_category,
        |    CASE WHEN coalesce(alt_ft, 0) <= 100 THEN
        |           CASE WHEN coalesce(speed_kn, 0) <= 5 THEN 'GROUND'
        |                WHEN coalesce(speed_kn, 0) <= 30 THEN 'TAXI'
        |                ELSE 'TAKEOFF' END
        |         WHEN coalesce(climb_fpm, 0) >= 500 THEN
        |           CASE WHEN coalesce(alt_ft, 0) < 3000 THEN 'TAKEOFF' ELSE 'CLIMB' END
        |         WHEN coalesce(climb_fpm, 0) <= -300 THEN
        |           CASE WHEN coalesce(alt_ft, 0) < 3000 THEN 'APPROACH' ELSE 'DESCENT' END
        |         WHEN coalesce(alt_ft, 0) >= 10000 THEN 'CRUISE'
        |         WHEN coalesce(speed_kn, 0) < 150 THEN 'APPROACH'
        |         ELSE 'CRUISE' END AS flight_phase
        |  FROM telem)
        |SELECT altitude_category, speed_category, flight_phase, count(*) AS n,
        |  round(sum(value::DECIMAL(18,2))::DOUBLE / count(value), 4) AS avg_value
        |FROM cat GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
  )
}
