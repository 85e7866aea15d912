package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exprs

/** Data-quality / anomaly operators (SURVEY.md §2.9 Q1-Q13), the reference's
  * distinctive surface, re-expressed as pure column expressions over events.
  *
  * Reference semantics mirrored:
  *   - 4-dimension weighted score (completeness .30, validity .30,
  *     consistency .25, timeliness .15) + letter grades + quarantine flag —
  *     reference `src/lambda/data_quality/quality_validator.py:49-282`.
  *   - timeliness: ≤60 s perfect, linear decay to 300 s, floor 0.2 beyond
  *     1800 s — `quality_validator.py:636-710`.
  *   - quarantine: score < 0.30 or any critical issue — `:94-96,808-820`.
  *   - geofence boxes / teleportation / stuck detection —
  *     `anomaly_detector.py:95-130,378-520`.
  *
  * "now" is pinned (`RefNow`) so timeliness is deterministic and
  * DuckDB-reproducible; in production it is a parameter, never
  * `current_timestamp()` (SURVEY §7 hard parts).
  *
  * Every check is a codegen'd boolean/arith expression — the whole scoring
  * pass is one projection, no shuffle until the final small aggregation.
  */
object Quality {

  /** Pinned "now": just past the events table's max timestamp. */
  val RefNowEpoch = 1706659200L // 2024-01-31 00:00:00 UTC

  private val validTypes = Seq("click", "view", "purchase", "signup", "error")

  /** Per-row quality columns: (completeness, validity, consistency,
    * timeliness, score, grade, quarantine, flags). */
  def scoreColumns(now: Column = lit(RefNowEpoch)): Seq[(String, Column)] = {
    // completeness: critical fields (user_id, value) weight 0.8 each is the
    // reference's penalty shape; important (props) 0.2
    val completeness = greatest(lit(0.0),
      lit(1.0)
        - when(col("user_id").isNull, 0.8).otherwise(0.0)
        - when(col("value").isNull, 0.8).otherwise(0.0)
        - when(col("props").isNull, 0.2).otherwise(0.0))
    // validity: range + set-membership + format checks. Every check is
    // coalesced to false so a NULL input counts as a failed check (matching
    // the oracle's CASE WHEN ... THEN 1 ELSE 0, where NULL takes the ELSE) —
    // un-coalesced, a null props/event_type would poison the whole score to
    // NULL and silently un-quarantine the row.
    def failedIsFalse(c: Column) = coalesce(c, lit(false))
    val vValue = failedIsFalse(col("value").between(0, 1000))
    val vType = failedIsFalse(col("event_type").isin(validTypes: _*))
    val vUser = failedIsFalse(col("user_id") >= 0)
    val vProps = failedIsFalse(col("props").rlike("^\\{.*\\}$"))
    val validity = (vValue.cast("double") + vType.cast("double") +
      vUser.cast("double") + vProps.cast("double")) / 4
    // consistency: cross-field contradictions (null-indeterminate → failed,
    // same ELSE-0 semantics as the oracle)
    val cPurchase = failedIsFalse(!(col("event_type") === "purchase" && col("value") <= 0))
    val cError = failedIsFalse(!(col("event_type") === "error" && col("value") > 500))
    val consistency = (cPurchase.cast("double") + cError.cast("double")) / 2
    // timeliness vs pinned now: ≤60 s → 1, linear to 300 s → 0.5-ish decay,
    // >1800 s → 0.2 (reference decay shape)
    // integer-floor seconds on both engines (Spark `div`, DuckDB `//`)
    val ageS = now - expr("ts_ns div 1000000000")
    val timeliness =
      when(ageS <= 60, 1.0)
        .when(ageS <= 300, lit(1.0) - (ageS - 60).cast("double") / lit(480.0))
        .when(ageS <= 1800, 0.5)
        .otherwise(0.2)
    val score = Exprs.dround(
      completeness * 0.30 + validity * 0.30 + consistency * 0.25 + timeliness * 0.15, 6)
    val grade = Exprs.gradeOf(score)
    val flags = concat_ws(",",
      when(!vValue, "INVALID_VALUE"),
      when(!vType, "INVALID_TYPE"),
      when(!cPurchase, "PURCHASE_NONPOSITIVE"),
      when(!cError, "ERROR_HIGH_VALUE"))
    val quarantine = score < 0.30 || !vValue || !vType
    Seq(
      "completeness" -> Exprs.dround(completeness, 6),
      "validity" -> Exprs.dround(validity, 6),
      "consistency" -> Exprs.dround(consistency, 6),
      "timeliness" -> Exprs.dround(timeliness, 6),
      "quality_score" -> score,
      "grade" -> grade,
      "quality_flags" -> flags,
      "quarantine" -> quarantine)
  }

  private def scored(spark: SparkSession, dir: String): DataFrame =
    scoreColumns().foldLeft(Tables.events(spark, dir)) {
      case (df, (name, c)) => df.withColumn(name, c)
    }

  /** q28 (Q1): per-grade distribution of the weighted quality score. */
  def q28QualityScore(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir)
      .groupBy(col("grade")).agg(
        count(lit(1)).as("n"),
        Exprs.dround(Exprs.sumExact(col("quality_score"), 6) / count(lit(1)), 6)
          .as("avg_score"),
        Exprs.dround(min(col("quality_score")), 6).as("min_score"),
        Exprs.dround(max(col("quality_score")), 6).as("max_score"),
        count(when(col("quarantine"), 1)).as("n_quarantined"))
      .orderBy(col("grade"))

  /** q29 (Q13): quarantine routing split — good/quarantine per event type
    * (the two-sink split's accounting; in production each side is a
    * partitioned parquet write). */
  def q29QuarantineSplit(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir)
      .withColumn("route", when(col("quarantine"), "quarantine").otherwise("good"))
      .groupBy(col("event_type"), col("route")).agg(
        count(lit(1)).as("n"),
        Exprs.dround(Exprs.sumExact(col("quality_score"), 6) / count(lit(1)), 6)
          .as("avg_score"))
      .orderBy(col("event_type"), col("route"))

  private def withPositions(df: DataFrame): DataFrame =
    Tables.withSyntheticPositions(df)

  /** q30 (Q6): stuck detection — all of the last 3 positions per user within
    * 4000 km of the current one (threshold sized to the synthetic coordinate
    * spread the way the reference sizes 0.05 mi to real trajectories). */
  def q30StuckDetection(spark: SparkSession, dir: String): DataFrame = {
    val e = withPositions(Tables.events(spark, dir))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(expr("ts_ns div 1000"), col("event_id"))
    def distBack(i: Int) = Exprs.haversineKm(
      lag(col("lat"), i).over(w), lag(col("lon"), i).over(w), col("lat"), col("lon"))
    val stuck = (1 to 3).map(i => distBack(i) < 4000).reduce(_ && _)
    e.withColumn("stuck", coalesce(stuck, lit(false)))
      .groupBy(col("user_id")).agg(
        count(when(col("stuck"), 1)).as("n_stuck"),
        count(lit(1)).as("n_total"))
      .filter(col("n_stuck") > 0)
      .orderBy(col("user_id"))
  }

  /** q31 (Q9): geofence violations — broadcast zone table of forbidden
    * boxes, between-predicate join, per-zone counts. */
  def q31Geofence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val zones = Seq(
      ("Z1", -10.0, 10.0, -20.0, 20.0),
      ("Z2", 30.0, 45.0, -170.0, -150.0),
      ("Z3", -50.0, -35.0, 100.0, 140.0)
    ).toDF("zone", "lat_min", "lat_max", "lon_min", "lon_max")
    val e = withPositions(Tables.events(spark, dir))
    e.join(broadcast(zones),
        col("lat").between(col("lat_min"), col("lat_max")) &&
        col("lon").between(col("lon_min"), col("lon_max")))
      .groupBy(col("zone")).agg(
        count(lit(1)).as("n_violations"),
        countDistinct(col("user_id")).as("n_users"),
        Exprs.dround(min(col("lat")), 2).as("min_lat"),
        Exprs.dround(max(col("lat")), 2).as("max_lat"))
      .orderBy(col("zone"))
  }

  /** q32 (Q5): teleportation — consecutive-point implied speed above a
    * feasibility ceiling (km/s), per-user counts. */
  def q32Teleport(spark: SparkSession, dir: String): DataFrame = {
    val e = withPositions(Tables.events(spark, dir))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(expr("ts_ns div 1000"), col("event_id"))
    val stepKm = Exprs.haversineKm(
      lag(col("lat"), 1).over(w), lag(col("lon"), 1).over(w), col("lat"), col("lon"))
    val dtS = (expr("ts_ns div 1000") - lag(expr("ts_ns div 1000"), 1).over(w)) / lit(1000000.0)
    val speed = when(dtS > 0, stepKm / dtS)
    e.withColumn("speed_kms", speed)
      .withColumn("teleport", col("speed_kms") > 0.3) // 0.3 km/s ≈ Mach 0.9
      .groupBy(col("user_id")).agg(
        count(when(col("teleport"), 1)).as("n_teleports"),
        count(col("speed_kms")).as("n_legs"),
        Exprs.dround(max(col("speed_kms")), 4).as("max_speed_kms"))
      .filter(col("n_teleports") > 0)
      .orderBy(col("user_id"))
  }

  /** The per-row score CTE with "now" substituted — q28/q29 pin RefNowEpoch,
    * the q54 dashboard pins an in-data now (Dashboard.DashNowEpoch). */
  private[graft] def scoreCte(now: Long = RefNowEpoch,
                              from: String = "events"): String =
    scoreSqlTemplate.replace("1706659200", now.toString)
      .replace("FROM events)", s"FROM $from)")

  private val scoreSqlTemplate =
    """scored AS (
      |  SELECT *,
      |    round((greatest(0.0, 1.0
      |        - CASE WHEN user_id IS NULL THEN 0.8 ELSE 0.0 END
      |        - CASE WHEN value IS NULL THEN 0.8 ELSE 0.0 END
      |        - CASE WHEN props IS NULL THEN 0.2 ELSE 0.0 END) * 0.30
      |      + ((CASE WHEN value IS NOT NULL AND value BETWEEN 0 AND 1000 THEN 1 ELSE 0 END
      |        + CASE WHEN event_type IN ('click','view','purchase','signup','error') THEN 1 ELSE 0 END
      |        + CASE WHEN user_id IS NOT NULL AND user_id >= 0 THEN 1 ELSE 0 END
      |        + CASE WHEN regexp_matches(props, '^\{.*\}$') THEN 1 ELSE 0 END) / 4.0) * 0.30
      |      + ((CASE WHEN NOT (event_type = 'purchase' AND value <= 0) THEN 1 ELSE 0 END
      |        + CASE WHEN NOT (event_type = 'error' AND value > 500) THEN 1 ELSE 0 END) / 2.0) * 0.25
      |      + (CASE WHEN 1706659200 - epoch_us(ts) // 1000000 <= 60 THEN 1.0
      |              WHEN 1706659200 - epoch_us(ts) // 1000000 <= 300
      |                THEN 1.0 - (1706659200 - epoch_us(ts) // 1000000 - 60) / 480.0
      |              WHEN 1706659200 - epoch_us(ts) // 1000000 <= 1800 THEN 0.5
      |              ELSE 0.2 END) * 0.15) * 1000000) / 1000000 AS quality_score,
      |    (CASE WHEN NOT (value IS NOT NULL AND value BETWEEN 0 AND 1000) THEN TRUE
      |          WHEN NOT (event_type IN ('click','view','purchase','signup','error')) THEN TRUE
      |          ELSE FALSE END) AS invalid_core
      |  FROM events)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q28_quality_score" ->
      s"""WITH ${scoreCte()},
        |graded AS (
        |  SELECT *,
        |    CASE WHEN quality_score >= 0.95 THEN 'A'
        |         WHEN quality_score >= 0.85 THEN 'B'
        |         WHEN quality_score >= 0.70 THEN 'C'
        |         WHEN quality_score >= 0.50 THEN 'D'
        |         ELSE 'F' END AS grade,
        |    (quality_score < 0.30 OR invalid_core) AS quarantine
        |  FROM scored)
        |SELECT grade, count(*) AS n,
        |  round(sum(quality_score::DECIMAL(25,6))::DOUBLE / count(*), 6) AS avg_score,
        |  round(min(quality_score), 6) AS min_score,
        |  round(max(quality_score), 6) AS max_score,
        |  count(CASE WHEN quarantine THEN 1 END) AS n_quarantined
        |FROM graded GROUP BY grade ORDER BY grade""".stripMargin,

    "q29_quarantine_split" ->
      s"""WITH ${scoreCte()},
        |routed AS (
        |  SELECT *,
        |    CASE WHEN quality_score < 0.30 OR invalid_core
        |         THEN 'quarantine' ELSE 'good' END AS route
        |  FROM scored)
        |SELECT event_type, route, count(*) AS n,
        |  round(sum(quality_score::DECIMAL(25,6))::DOUBLE / count(*), 6) AS avg_score
        |FROM routed GROUP BY event_type, route ORDER BY event_type, route""".stripMargin,

    "q30_stuck_detection" ->
      """WITH pts AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, event_id,
        |    value - 50 AS lat,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) * 3.6::DOUBLE - 180 AS lon
        |  FROM events),
        |lagged AS (
        |  SELECT user_id, lat, lon,
        |    lag(lat, 1) OVER w AS lat1, lag(lon, 1) OVER w AS lon1,
        |    lag(lat, 2) OVER w AS lat2, lag(lon, 2) OVER w AS lon2,
        |    lag(lat, 3) OVER w AS lat3, lag(lon, 3) OVER w AS lon3
        |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |flagged AS (
        |  SELECT user_id,
        |    coalesce(
        |      2 * 6371.0 * asin(sqrt(pow(sin(radians(lat - lat1) / 2), 2) +
        |        cos(radians(lat1)) * cos(radians(lat)) * pow(sin(radians(lon - lon1) / 2), 2))) < 4000
        |      AND
        |      2 * 6371.0 * asin(sqrt(pow(sin(radians(lat - lat2) / 2), 2) +
        |        cos(radians(lat2)) * cos(radians(lat)) * pow(sin(radians(lon - lon2) / 2), 2))) < 4000
        |      AND
        |      2 * 6371.0 * asin(sqrt(pow(sin(radians(lat - lat3) / 2), 2) +
        |        cos(radians(lat3)) * cos(radians(lat)) * pow(sin(radians(lon - lon3) / 2), 2))) < 4000,
        |      FALSE) AS stuck
        |  FROM lagged)
        |SELECT user_id, count(CASE WHEN stuck THEN 1 END) AS n_stuck, count(*) AS n_total
        |FROM flagged GROUP BY user_id HAVING count(CASE WHEN stuck THEN 1 END) > 0
        |ORDER BY user_id""".stripMargin,

    "q31_geofence" ->
      """WITH zones(zone, lat_min, lat_max, lon_min, lon_max) AS (
        |  VALUES ('Z1', -10.0, 10.0, -20.0, 20.0),
        |         ('Z2', 30.0, 45.0, -170.0, -150.0),
        |         ('Z3', -50.0, -35.0, 100.0, 140.0)),
        |pts AS (
        |  SELECT user_id,
        |    value - 50 AS lat,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) * 3.6::DOUBLE - 180 AS lon
        |  FROM events)
        |SELECT zone, count(*) AS n_violations, count(DISTINCT user_id) AS n_users,
        |  round(min(lat), 2) AS min_lat, round(max(lat), 2) AS max_lat
        |FROM pts JOIN zones
        |  ON lat BETWEEN lat_min AND lat_max AND lon BETWEEN lon_min AND lon_max
        |GROUP BY zone ORDER BY zone""".stripMargin,

    "q32_teleport" ->
      """WITH pts AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, event_id,
        |    value - 50 AS lat,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) * 3.6::DOUBLE - 180 AS lon
        |  FROM events),
        |legs AS (
        |  SELECT user_id, lat, lon, t_us,
        |    lag(lat, 1) OVER w AS plat, lag(lon, 1) OVER w AS plon,
        |    lag(t_us, 1) OVER w AS pt_us
        |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |speeds AS (
        |  SELECT user_id,
        |    CASE WHEN (t_us - pt_us) / 1000000.0 > 0 THEN
        |      (2 * 6371.0 * asin(sqrt(pow(sin(radians(lat - plat) / 2), 2) +
        |        cos(radians(plat)) * cos(radians(lat)) * pow(sin(radians(lon - plon) / 2), 2))))
        |      / ((t_us - pt_us) / 1000000.0)
        |    END AS speed_kms
        |  FROM legs)
        |SELECT user_id,
        |  count(CASE WHEN speed_kms > 0.3 THEN 1 END) AS n_teleports,
        |  count(speed_kms) AS n_legs,
        |  round(max(speed_kms), 4) AS max_speed_kms
        |FROM speeds GROUP BY user_id
        |HAVING count(CASE WHEN speed_kms > 0.3 THEN 1 END) > 0
        |ORDER BY user_id""".stripMargin,
  )
}
