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

  /** Bounded-retry policy for DLQ replay (the batch-side analog of the
    * reference's RetryConfig + CircuitBreakerConfig,
    * `error_recovery.py:64-101,600-728`): `maxAttempts` before permanent
    * dead-lettering; exponential cool-down base·mult^(attempt-1) capped at
    * `maxDelayS`; a whole-queue circuit breaker that opens for
    * `breakerCooldownS` once a run produces ≥ `breakerFailureThreshold`
    * failures. No jitter: jitter prevents thundering herds on live queues,
    * while a batch replay is already a single coordinated run — and
    * determinism is what makes the policy spec-checkable. */
  case class RetryPolicy(maxAttempts: Int = 3, baseDelayS: Double = 1.0,
                         backoffMultiplier: Double = 2.0, maxDelayS: Double = 60.0,
                         breakerFailureThreshold: Int = 5,
                         breakerCooldownS: Long = 120L)

  /** One policy-governed replay run's routing. `breakerOpenUntilS` is the
    * state the caller hands to the next run (0 = closed). */
  case class ReplayOutcome(recovered: DataFrame, requeued: DataFrame,
                           dead: DataFrame, breakerOpenUntilS: Long)

  /** Stable replay identity: DLQ dedup/anti-join key, derived only from
    * record content so it survives round trips through any sink. */
  private[graft] def dlqId = md5(concat_ws("\u0000", col("raw"), col("source_file")))

  /** Stamp captured corrupt records with retry metadata (attempt 0,
    * immediately eligible) — the enqueue half of the DLQ contract. */
  def enqueueDlq(bad: DataFrame, nowS: Long): DataFrame =
    bad.select(col("raw"), col("source_file"), dlqId.as("dlq_id"),
      lit(0).as("attempts"), lit(nowS).as("next_eligible_s"))

  /** [[reprocessErrors]] as a policy-pluggable replay body: returns the
    * recovered rows keyed by `dlq_id` (recomputed from content — the fix-up
    * ladder preserves `raw`/`source_file` verbatim). */
  def ladderReplay(eligible: DataFrame): DataFrame = {
    val (rec, _) = reprocessErrors(eligible.select(col("raw"), col("source_file")))
    rec.withColumn("dlq_id", dlqId)
  }

  /** S10 replay under [[RetryPolicy]] (reference
    * `error_recovery.py:600-728` batch-side). Routing per run:
    *
    *   - breaker open (`nowS < breakerOpenUntilS`): nothing replays, the
    *     whole queue re-queues untouched — the cool-down that stops a
    *     systemically-failing fixup from burning a replay budget per batch.
    *   - cooling down (`next_eligible_s > nowS`): passes through unchanged.
    *   - eligible: runs `replay` (default [[ladderReplay]]); failures
    *     re-queue with attempts+1 and an exponentially backed-off
    *     `next_eligible_s` (base·mult^attempts, capped at maxDelayS);
    *     records reaching `maxAttempts` route to `dead` instead, stamped
    *     `dead_reason = max_attempts_exhausted`.
    *
    * The only driver-side action is one count of this run's failures (the
    * breaker input) — DLQ-sized, not corpus-sized. Deterministic given
    * (queue state, nowS): replay cost per run is O(strategies × |eligible|)
    * scans, and total per record is bounded by maxAttempts — the property
    * the spec proves with a flaky fix-up. */
  def replayWithPolicy(dlq: DataFrame, nowS: Long,
                       policy: RetryPolicy = RetryPolicy(),
                       breakerOpenUntilS: Long = 0L,
                       replay: DataFrame => DataFrame = ladderReplay)
      : ReplayOutcome = {
    val queueCols = Seq("raw", "source_file", "dlq_id", "attempts",
      "next_eligible_s").map(col)
    if (nowS < breakerOpenUntilS)
      return ReplayOutcome(replay(dlq.limit(0)), dlq.select(queueCols: _*),
        dlq.limit(0).select(queueCols: _*)
          .withColumn("dead_reason", lit("")), breakerOpenUntilS)
    val eligible = dlq.filter(col("next_eligible_s") <= nowS &&
      col("attempts") < policy.maxAttempts)
    val waiting = dlq.filter(col("next_eligible_s") > nowS &&
      col("attempts") < policy.maxAttempts)
    // defensive: exhausted rows already in the queue route straight out
    val preExhausted = dlq.filter(col("attempts") >= policy.maxAttempts)
      .select(queueCols: _*)
      .withColumn("dead_reason", lit("max_attempts_exhausted"))
    val recovered = replay(eligible)
    val failed = eligible
      .join(recovered.select(col("dlq_id")), Seq("dlq_id"), "left_anti")
      .withColumn("attempts", col("attempts") + 1)
    val delay = least(lit(policy.maxDelayS),
      lit(policy.baseDelayS) *
        pow(lit(policy.backoffMultiplier), col("attempts") - 1))
    val retriable = failed.filter(col("attempts") < policy.maxAttempts)
      .withColumn("next_eligible_s", (lit(nowS) + ceil(delay)).cast("long"))
      .select(queueCols: _*)
    val newlyDead = failed.filter(col("attempts") >= policy.maxAttempts)
      .select(queueCols: _*)
      .withColumn("dead_reason", lit("max_attempts_exhausted"))
    val nFailed = failed.count()
    val openUntil =
      if (nFailed >= policy.breakerFailureThreshold) nowS + policy.breakerCooldownS
      else 0L
    ReplayOutcome(recovered, waiting.select(queueCols: _*).unionByName(retriable),
      preExhausted.unionByName(newlyDead), openUntil)
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

  /** q141: the local dashboard's flight-summary endpoint as a relation —
    * `dashboard-api.py handle_flight_summary_api` (:88-205), the one
    * query-shaped reference file §3.4 had not named: airborne/ground
    * split, position coverage over the FIRST-100 slice, speed/altitude
    * stats and the 4 altitude bands computed over the endpoint's
    * every-10th-state SAMPLE (its "sample for performance" quirk, mirrored
    * faithfully — including that only values > 0 enter the stats), top-10
    * countries over ALL states, and top-10 fastest aircraft (> 200 kn)
    * drawn from the sampled subset. Long format (section, rank, item,
    * n, v) — the q126 analyzer-summary shape.
    *
    * Pseudo-telemetry is the q33 derivation (alt = 600·value ft — integer-
    * valued since value is exactly 2 dp; speed = 6·k kn), country rides
    * event_type, callsign = 'FL'||user_id, and the endpoint's positional
    * i%10 / first-100 slices become event_id predicates (the q56 rule:
    * deterministic membership, not row order). Python's stable sort on
    * ties becomes explicit (count desc, country) / (speed desc, event_id)
    * tiebreaks. All sums are exact integers; means guard n > 0 before
    * dividing (ANSI).
    *
    * Scale shape: one conditional-aggregation pass over the scan for every
    * scalar stat and band (J5 1-row combine), a count-grain top-10 on
    * countries, and a 10-row TakeOrderedAndProject for the fastest table —
    * three column-pruned scans, no window over the fact table. */
  def q141FlightSummary(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      // EXACT integer telemetry: value is 2-dp, so decimal×600 is integral
      // and the BIGINT cast is unambiguous — a double alt_ft would make
      // Spark's truncating cast and DuckDB's rounding cast disagree 1 ulp
      // below an integer
      .withColumn("alt_ft",
        (col("value").cast("decimal(18,2)") * 600).cast("long"))
      .withColumn("speed_kn", (col("k") * 6).cast("long"))
      .withColumn("on_ground", col("k") % 5 === 0)
      .withColumn("has_position", col("k") % 3 =!= 0)
      .withColumn("sampled", col("event_id") % 10 === 0)
    val sAlt = col("sampled") && col("alt_ft") > 0
    val sSpd = col("sampled") && col("speed_kn") > 0
    def nul = lit(null).cast("double")
    def nuln = lit(null).cast("bigint")
    val stats = e.groupBy().agg(
      count(lit(1)).as("total"),
      count(when(!col("on_ground"), 1)).as("airborne"),
      count(when(col("has_position") && col("event_id") < 100, 1)).as("wpos"),
      sum(when(sAlt, col("alt_ft"))).as("alt_sum"),
      count(when(sAlt, 1)).as("alt_n"),
      max(when(sAlt, col("alt_ft"))).as("alt_max"),
      min(when(sAlt, col("alt_ft"))).as("alt_min"),
      count(when(sAlt && col("alt_ft") <= 10000, 1)).as("b_low"),
      count(when(sAlt && col("alt_ft") > 10000 && col("alt_ft") <= 30000, 1)).as("b_med"),
      count(when(sAlt && col("alt_ft") > 30000 && col("alt_ft") <= 50000, 1)).as("b_high"),
      count(when(sAlt && col("alt_ft") > 50000, 1)).as("b_vhigh"),
      sum(when(sSpd, col("speed_kn"))).as("spd_sum"),
      count(when(sSpd, 1)).as("spd_n"),
      max(when(sSpd, col("speed_kn"))).as("spd_max"))
    // identical field NAMES in every struct, or array() rejects the mix
    def rowOf(section: String, item: String, n: Column, v: Column) =
      struct(lit(section).as("section"), lit(0L).as("rank"),
        lit(item).as("item"), n.cast("bigint").as("n"),
        v.cast("double").as("v"))
    val scalarRows = stats.select(array(
        rowOf("overview", "total_flights", col("total"), nul),
        rowOf("overview", "flights_airborne", col("airborne"), nul),
        // the reference computes ground = total - airborne (:107), so a row
        // whose on_ground is unknowable still lands in a bucket
        rowOf("overview", "flights_on_ground",
          col("total") - col("airborne"), nul),
        rowOf("overview", "flights_with_position", col("wpos"), nul),
        rowOf("altitude_stats", "mean_altitude_ft", nuln,
          when(col("alt_n") > 0, Exprs.dround(
            col("alt_sum").cast("double") / col("alt_n"), 4)).otherwise(0.0)),
        rowOf("altitude_stats", "max_altitude_ft", nuln,
          coalesce(col("alt_max"), lit(0.0))),
        rowOf("altitude_stats", "min_altitude_ft", nuln,
          coalesce(col("alt_min"), lit(0.0))),
        rowOf("altitude_distribution", "Low (0-10k ft)", col("b_low"), nul),
        rowOf("altitude_distribution", "Medium (10-30k ft)", col("b_med"), nul),
        rowOf("altitude_distribution", "High (30-50k ft)", col("b_high"), nul),
        rowOf("altitude_distribution", "Very High (>50k ft)", col("b_vhigh"), nul),
        rowOf("speed_stats", "mean_speed_knots", nuln,
          when(col("spd_n") > 0, Exprs.dround(
            col("spd_sum").cast("double") / col("spd_n"), 4)).otherwise(0.0)),
        rowOf("speed_stats", "max_speed_knots", nuln,
          coalesce(col("spd_max"), lit(0.0)))).as("rows"))
      .select(explode(col("rows")).as("r")).select(col("r.*"))
    // the endpoint only counts truthy countries (:129); the guard also
    // keeps a hypothetical NULL group out of the rank tiebreak, where the
    // engines' NULL ordering differs.
    // The two partition-less rank windows below are safe ONLY because each
    // sits on a post-limit <=10-row relation (one task, ten rows); on an
    // unbounded relation a global Window.orderBy serializes the whole
    // dataset through a single task — do not copy this shape upstream of a
    // limit
    val countries = e.filter(col("event_type").isNotNull)
      .groupBy(col("event_type").as("item"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("item")).limit(10)
      .select(lit("top_countries").as("section"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("item")))).cast("long").as("rank"),
        col("item"), col("n"), nul.as("v"))
    val fastest = e.filter(col("sampled") && col("speed_kn") > 200)
      .orderBy(col("speed_kn").desc, col("event_id")).limit(10)
      .select(lit("top_fastest").as("section"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("speed_kn").desc, col("event_id")))).cast("long").as("rank"),
        concat(lit("FL"), col("user_id")).as("item"),
        nuln.as("n"), col("speed_kn").cast("double").as("v"))
    scalarRows.unionByName(countries).unionByName(fastest)
      .orderBy(col("section"), col("rank"), col("item"))
  }

  val oracle: Map[String, String] = Map(
    "q141_flight_summary" ->
      """WITH base AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |    (value::DECIMAL(18,2) * 600)::BIGINT AS alt_ft
        |  FROM events),
        |st AS (
        |  SELECT *, (k * 6)::BIGINT AS speed_kn,
        |    (k % 5 = 0) AS on_ground, (k % 3 <> 0) AS has_position,
        |    (event_id % 10 = 0) AS sampled
        |  FROM base),
        |stats AS (
        |  SELECT count(*)::BIGINT AS total,
        |    count(CASE WHEN NOT on_ground THEN 1 END)::BIGINT AS airborne,
        |    count(CASE WHEN has_position AND event_id < 100 THEN 1 END)::BIGINT AS wpos,
        |    sum(CASE WHEN sampled AND alt_ft > 0 THEN alt_ft END)::BIGINT AS alt_sum,
        |    count(CASE WHEN sampled AND alt_ft > 0 THEN 1 END)::BIGINT AS alt_n,
        |    max(CASE WHEN sampled AND alt_ft > 0 THEN alt_ft END) AS alt_max,
        |    min(CASE WHEN sampled AND alt_ft > 0 THEN alt_ft END) AS alt_min,
        |    count(CASE WHEN sampled AND alt_ft > 0 AND alt_ft <= 10000 THEN 1 END)::BIGINT AS b_low,
        |    count(CASE WHEN sampled AND alt_ft > 10000 AND alt_ft <= 30000 THEN 1 END)::BIGINT AS b_med,
        |    count(CASE WHEN sampled AND alt_ft > 30000 AND alt_ft <= 50000 THEN 1 END)::BIGINT AS b_high,
        |    count(CASE WHEN sampled AND alt_ft > 50000 THEN 1 END)::BIGINT AS b_vhigh,
        |    sum(CASE WHEN sampled AND speed_kn > 0 THEN speed_kn END)::BIGINT AS spd_sum,
        |    count(CASE WHEN sampled AND speed_kn > 0 THEN 1 END)::BIGINT AS spd_n,
        |    max(CASE WHEN sampled AND speed_kn > 0 THEN speed_kn END) AS spd_max
        |  FROM st),
        |scalar AS (
        |  SELECT 'overview' AS section, 0::BIGINT AS "rank",
        |    'total_flights' AS item, total AS n, NULL::DOUBLE AS v FROM stats
        |  UNION ALL SELECT 'overview', 0, 'flights_airborne', airborne, NULL FROM stats
        |  UNION ALL SELECT 'overview', 0, 'flights_on_ground', total - airborne, NULL FROM stats
        |  UNION ALL SELECT 'overview', 0, 'flights_with_position', wpos, NULL FROM stats
        |  UNION ALL SELECT 'altitude_stats', 0, 'mean_altitude_ft', NULL,
        |    CASE WHEN alt_n > 0
        |      THEN round(alt_sum::DOUBLE / alt_n * 10000) / 10000
        |      ELSE 0.0 END FROM stats
        |  UNION ALL SELECT 'altitude_stats', 0, 'max_altitude_ft', NULL,
        |    coalesce(alt_max, 0)::DOUBLE FROM stats
        |  UNION ALL SELECT 'altitude_stats', 0, 'min_altitude_ft', NULL,
        |    coalesce(alt_min, 0)::DOUBLE FROM stats
        |  UNION ALL SELECT 'altitude_distribution', 0, 'Low (0-10k ft)', b_low, NULL FROM stats
        |  UNION ALL SELECT 'altitude_distribution', 0, 'Medium (10-30k ft)', b_med, NULL FROM stats
        |  UNION ALL SELECT 'altitude_distribution', 0, 'High (30-50k ft)', b_high, NULL FROM stats
        |  UNION ALL SELECT 'altitude_distribution', 0, 'Very High (>50k ft)', b_vhigh, NULL FROM stats
        |  UNION ALL SELECT 'speed_stats', 0, 'mean_speed_knots', NULL,
        |    CASE WHEN spd_n > 0
        |      THEN round(spd_sum::DOUBLE / spd_n * 10000) / 10000
        |      ELSE 0.0 END FROM stats
        |  UNION ALL SELECT 'speed_stats', 0, 'max_speed_knots', NULL,
        |    coalesce(spd_max, 0)::DOUBLE FROM stats),
        |countries AS (
        |  SELECT event_type AS item, count(*)::BIGINT AS n
        |  FROM st WHERE event_type IS NOT NULL GROUP BY event_type),
        |top_c AS (
        |  SELECT 'top_countries' AS section, rn AS "rank", item, n,
        |    NULL::DOUBLE AS v
        |  FROM (SELECT item, n,
        |          row_number() OVER (ORDER BY n DESC, item)::BIGINT AS rn
        |        FROM countries)
        |  WHERE rn <= 10),
        |top_f AS (
        |  SELECT 'top_fastest' AS section, rn AS "rank",
        |    'FL' || user_id AS item, NULL::BIGINT AS n, speed_kn::DOUBLE AS v
        |  FROM (SELECT user_id, speed_kn,
        |          row_number() OVER (ORDER BY speed_kn DESC, event_id)::BIGINT AS rn
        |        FROM st WHERE sampled AND speed_kn > 200)
        |  WHERE rn <= 10)
        |SELECT * FROM scalar
        |UNION ALL SELECT * FROM top_c
        |UNION ALL SELECT * FROM top_f
        |ORDER BY section, "rank", item""".stripMargin,

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
