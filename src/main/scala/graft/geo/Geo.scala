package graft.geo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Exprs, Pct}

/** Spatial analytics over the synthetic coordinate grid (SURVEY.md §2 J2
  * spatial join, the reference's two most distinctive geo reports):
  *
  *   - q52: airport proximity & traffic analysis — reference
  *     `sql/athena/05_analytical_queries_part2.sql:145-308`: bounding-box
  *     pre-filter → equirectangular distance ≤ R → nearest airport per
  *     flight → per-airport directional/phase aggregation with dominance
  *     CASEs.
  *   - q55: route-corridor classification — reference
  *     `sql/athena/04_analytical_queries.sql:330-460`: grid-cell corridors
  *     with geographic-region + corridor-type ladders, heading variance and
  *     a route-consistency score.
  *
  * Scale shape: the airport dim is 25 rows → broadcast; the box predicate
  * prunes the per-event candidate fan-out to ≤2 airports before any
  * distance math; nearest-per-event is a row_number window hashed on
  * event_id (no global ordering). Corridors aggregate to ≤ (lat cells ×
  * lon cells) rows before the only global window (rank over aggregated
  * cells), so both survive a 1000-executor 100 TB run unchanged.
  */
object Geo {

  /** Deterministic airport reference derived from `nation` (25 rows): two
    * lon columns 21.6° apart whose interleaved lat ladders (7.5° spacing,
    * half-offset 3.75°) guarantee some events fall inside two airports'
    * boxes — so the nearest-airport row_number genuinely selects (613
    * candidate pairs → 585 kept at sf0.01). */
  def airports(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir).select(
      col("n_name").as("airport_code"),
      col("n_nationkey").as("akey"),
      ((col("n_nationkey") % 13) * 7.5 - 45 +
        expr("n_nationkey div 13") * 3.75).as("alat"),
      (expr("n_nationkey div 13") * 21.6 - 90).as("alon"))

  /** q52's top-1-nearest relation BEFORE its localCheckpoint — extracted
    * (r22, VERDICT item 8) so PlanQualitySpec pins the real query's
    * map-side WindowGroupLimit: the checkpoint hides the window subtree
    * from the final plan, and the r21 spec's synthetic twin would not
    * catch a regression in q52 itself (e.g. a second window expression
    * defeating InferWindowGroupLimit). */
  private[graft] def q52Nearest(spark: SparkSession, dir: String): DataFrame = {
    val ap = airports(spark, dir)
    // value ≤ 100 is the data_quality_score > 0.8 pre-filter analog (and
    // keeps the synthetic lat inside real range for this query)
    // r21: hash-repartition the slim event relation by event_id BEFORE the
    // broadcast range join. Two wins, measured: (1) events.parquet reads
    // as one split at test SFs, so the join + distance math ran on a
    // single core — twice, because the Pct branch's column pruning makes
    // the two `nearest` subtrees canonically different and AQE stage
    // reuse never fires (two sequential 1.5 s single-task stages); the
    // repartition exchange IS canonically shared, and everything above it
    // runs at full parallelism. (2) The top-1 window partitions by
    // event_id, so establishing that partitioning below the join removes
    // the post-join exchange of the ~2.5x wider candidate relation
    // (guide §2.4) — the shuffle moves slim events once instead.
    // explicit count from the session conf: a bare repartition(col) is
    // AQE-coalesced back to 1-2 partitions at this volume and the join
    // stays serial — the conf value is the scale dial (bench contract
    // sets it to the core count; clusters tune it to data)
    val e = Tables.withSyntheticPositions(Tables.events(spark, dir))
      .filter(col("value") <= 100)
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("event_id"))
    val cand = e.join(broadcast(ap),
        col("lat").between(col("alat") - 4, col("alat") + 4) &&
        col("lon").between(col("alon") - 12, col("alon") + 12))
      .withColumn("dist_mi", Exprs.dround(
        Exprs.equirectMi(col("lat"), col("lon"), col("alat"), col("alon")), 4))
      .filter(col("dist_mi") <= 450)
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("dist_mi"), col("akey"))
    cand
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .withColumn("octant",
        Exprs.bearingOctant(col("alat"), col("alon"), col("lat"), col("lon")))
  }

  /** q52: flights near airports — box pre-filter, planar distance, top-1
    * nearest per event, per-airport directional traffic profile. */
  def q52AirportProximity(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: `nearest` feeds TWO aggregations (the per-airport
    // rollup and the Pct quartile pass), and per-branch column pruning
    // makes the two copies canonically DIFFERENT, so neither static
    // ReuseExchange nor AQE stage reuse ever dedupes them — the whole
    // scan→join→window pipeline ran twice (r21, measured: twin 1.5 s
    // single-task stages). One bounded materialization (top-1 row per
    // event, slim columns) ends that; both consumers re-aggregate it.
    val nearest = q52Nearest(spark, dir).localCheckpoint()
    def octCount(vals: String*) =
      count(when(col("octant").isin(vals: _*), 1))
    // exact order-statistics quartiles of dist_mi (Pct): dist_mi is 4dp —
    // a bounded grid per airport — so the extra pass over `nearest` is a
    // hash agg + per-airport window, engine-version robust where the
    // percentile/quantile_cont pairing is only empirically bitwise-equal
    val pcts = Pct.relation(nearest, Seq("airport_code"), "dist_mi",
      Seq("q25" -> 0.25, "q75" -> 0.75))
    nearest.groupBy(col("airport_code")).agg(
        count(lit(1)).as("n_nearby"),
        countDistinct(col("user_id")).as("n_users"),
        Exprs.dround(Exprs.sumExact(col("dist_mi"), 4) / count(lit(1)), 4)
          .as("avg_dist_mi"),
        Exprs.dround(min(col("dist_mi")), 4).as("min_dist_mi"),
        count(when(col("value") < 20, 1)).as("n_low_value"),
        count(when(col("value") < 5, 1)).as("n_very_low"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        count(when(col("event_type") === "signup", 1)).as("n_signup"),
        octCount("N").as("n_north"),
        octCount("S").as("n_south"),
        octCount("E").as("n_east"),
        octCount("W").as("n_west"),
        octCount("NE", "NW").as("n_north_diag"),
        octCount("SE", "SW").as("n_south_diag"),
        Exprs.dround(coalesce(
          Exprs.sumExact2(when(col("dist_mi") < 100, col("value"))) /
            count(when(col("dist_mi") < 100, 1)), lit(0.0)), 2)
          .as("avg_value_close"))
      .filter(col("n_nearby") >= 5)
      .join(broadcast(pcts), "airport_code")
      .withColumn("q25_dist_mi", Exprs.dround(col("q25"), 4))
      .withColumn("q75_dist_mi", Exprs.dround(col("q75"), 4))
      .drop("q25", "q75")
      .withColumn("events_per_hour",
        Exprs.dround(col("n_nearby") / lit(720.0), 4))
      .withColumn("ops_pct",
        Exprs.pctOf(col("n_purchase") + col("n_signup"), col("n_nearby"), 2))
      .withColumn("traffic_intensity",
        when(col("events_per_hour") > 0.05, "High")
          .when(col("events_per_hour") > 0.02, "Moderate")
          .otherwise("Low"))
      .withColumn("ns_pattern",
        when(col("n_north") + col("n_north_diag") >
             col("n_south") + col("n_south_diag"), "North Dominant")
          .when(col("n_south") + col("n_south_diag") >
                col("n_north") + col("n_north_diag"), "South Dominant")
          .otherwise("Balanced N-S"))
      .withColumn("ew_pattern",
        when(col("n_east") > col("n_west"), "East Dominant")
          .when(col("n_west") > col("n_east"), "West Dominant")
          .otherwise("Balanced E-W"))
      .orderBy(col("n_nearby").desc, col("airport_code"))
  }

  /** q55: corridor classification — per-leg track bearing (window lag per
    * user), 10°×18° grid cells, region/type ladders, exact-decimal heading
    * variance (plain stddev of doubles is accumulation-order-dependent and
    * would break the oracle hash), rank over the aggregated cells. */
  def q55CorridorClassify(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.withSyntheticPositions(Tables.events(spark, dir))
      .filter(col("value") <= 150)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(expr("ts_ns div 1000"), col("event_id"))
    // 0/360 seam: a 1-ulp atan2 difference across engines near due-north
    // flips the 2dp-rounded bearing between 0.00 and 360.00; collapsing 360
    // to 0 AFTER rounding makes both engines agree on the seam.
    val track0 = Exprs.dround(when(col("plat").isNotNull,
      Exprs.bearingDeg(col("plat"), col("plon"), col("lat"), col("lon"))), 2)
    val legs = e
      .withColumn("plat", lag(col("lat"), 1).over(w))
      .withColumn("plon", lag(col("lon"), 1).over(w))
      .withColumn("track", when(track0 === 360.0, 0.0).otherwise(track0))
      .withColumn("cell_lat", Exprs.gridCell(col("lat"), 10))
      .withColumn("cell_lon", Exprs.gridCell(col("lon"), 18))
    val cells = legs.groupBy(col("cell_lat"), col("cell_lon")).agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("user_id")).as("unique_users"),
        count(col("track")).as("n_legs"),
        Exprs.sumExact(col("track"), 2).as("sx"),
        Exprs.sumExact(col("track") * col("track"), 4).as("sx2"))
      .filter(col("total_events") >= 8)
    // sample variance from exact decimal sums: identical double arithmetic
    // on both engines, unlike distributed stddev_samp
    val varCol = (col("sx2") - col("sx") * col("sx") / col("n_legs")) /
      (col("n_legs") - 1)
    val classified = cells
      .withColumn("events_per_hour",
        Exprs.dround(col("total_events") / lit(720.0), 4))
      .withColumn("avg_heading",
        Exprs.dround(col("sx") / col("n_legs"), 2))
      .withColumn("heading_stddev",
        Exprs.dround(sqrt(greatest(varCol, lit(0.0))), 4))
      .withColumn("route_consistency",
        Exprs.dround(lit(1.0) / (lit(1.0) + col("heading_stddev") / 180.0), 4))
      .withColumn("geographic_region",
        when(col("cell_lat").between(30, 60) &&
             col("cell_lon").between(-130, -60), "North America")
          .when(col("cell_lat").between(40, 70) &&
                col("cell_lon").between(-10, 40), "Europe")
          .when(col("cell_lat").between(20, 50) &&
                col("cell_lon").between(100, 140), "East Asia")
          .when(col("cell_lat").between(30, 50) &&
                col("cell_lon").between(40, 80), "Central Asia/Middle East")
          .when(col("cell_lat").between(-40, -10) &&
                col("cell_lon").between(110, 160), "Australia/Oceania")
          .when(col("cell_lat").between(-40, 10) &&
                col("cell_lon").between(-80, -30), "South America")
          .when(col("cell_lat").between(-40, 40) &&
                col("cell_lon").between(-20, 60), "Africa")
          .otherwise("Other/Oceanic"))
      .withColumn("corridor_type",
        when(col("total_events") > 80, "Major International Corridor")
          .when(col("total_events") > 60, "Regional Corridor")
          .when(col("total_events") > 40, "Secondary Route")
          .otherwise("Local Route"))
      .withColumn("primary_direction",
        when(col("avg_heading") < 45 || col("avg_heading") >= 315, "North")
          .when(col("avg_heading") < 135, "East")
          .when(col("avg_heading") < 225, "South")
          .otherwise("West"))
    // rank over ≤ a few hundred aggregated cells — bounded single partition
    classified
      .withColumn("corridor_rank",
        rank().over(Window.orderBy(col("total_events").desc)))
      .select(col("corridor_rank"), col("cell_lat"), col("cell_lon"),
        col("geographic_region"), col("corridor_type"), col("total_events"),
        col("unique_users"), col("events_per_hour"), col("avg_heading"),
        col("heading_stddev"), col("route_consistency"),
        col("primary_direction"))
      .orderBy(col("corridor_rank"), col("cell_lat"), col("cell_lon"))
  }

  /** Bit-interleave (Morton / Z-order) of two 10-bit quantized coordinates,
    * written as pure integer div/mod/multiply so the SAME generated text
    * runs on Spark (`div`) and DuckDB (`//`) — no engine-specific bit
    * intrinsics, no float in the key path. */
  private def zTerms(latCol: String, lonCol: String, idiv: String): String =
    (0 until 10).map { i =>
      val p = 1L << i
      s"(($latCol $idiv $p) % 2) * ${1L << (2 * i + 1)} + " +
        s"(($lonCol $idiv $p) % 2) * ${1L << (2 * i)}"
    }.mkString(" + ")

  /** q89: Z-order layout keys + bucket locality audit — the write-side
    * data-layout operator for spatial workloads at 100 TB: sorting (or
    * `repartitionByRange`-ing) the fact table by a Morton key before the
    * parquet write makes each file's lat/lon min/max stats tight in BOTH
    * dimensions, so 2-D predicate pushdown prunes files the way 1-D
    * partitioning never can. This query computes the key and audits its
    * locality: per top-6-bit bucket, how tight is the bounding box and how
    * much of it is actually occupied (fill %). Quantization is pure BIGINT
    * arithmetic (value is exactly 2dp; lon derives from integer `k`), so
    * no float boundary can flip a cell between engines.
    *
    * Scale shape: one hash aggregation to (bucket) grain — the interleave
    * is ~60 integer ops per row inside whole-stage codegen, and the
    * distinct-cell count keys on a single packed BIGINT. */
  def q89ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(spark, dir)
      .filter(col("value") <= 100)
      .withColumn("latq",
        expr("((cast(round(value * 100, 0) as bigint) + 4000) * 1024) div 18000"))
      .withColumn("lonq",
        expr("(cast(get_json_object(props, '$.k') as bigint) * 1024) div 100"))
      .withColumn("zkey", expr(zTerms("latq", "lonq", "div")))
    pts
      .groupBy(expr("zkey div 16384").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("latq") * 1024 + col("lonq")).as("n_cells"),
        (max(col("latq")) - min(col("latq")) + 1).as("lat_span"),
        (max(col("lonq")) - min(col("lonq")) + 1).as("lon_span"))
      .withColumn("bbox_cells", col("lat_span") * col("lon_span"))
      .withColumn("fill_pct", Exprs.pctOf(col("n_cells"), col("bbox_cells"), 2))
      .select(col("bucket"), col("n"), col("n_cells"), col("lat_span"),
        col("lon_span"), col("bbox_cells"), col("fill_pct"))
      .orderBy(col("bucket"))
  }

  // Non-dyadic literals (21.6, 3.6) MUST be ::DOUBLE: DuckDB parses them as
  // DECIMAL and computes alat/alon/lon exactly, while Spark computes the
  // double products — 1 ulp apart, which flips 4dp-rounded distances and
  // octant CASEs on boundary rows (one flip per ~10k rows empirically).
  private val airportsCte =
    """airports AS (
      |  SELECT n_name AS airport_code, n_nationkey AS akey,
      |    (n_nationkey % 13) * 7.5::DOUBLE - 45 + (n_nationkey // 13) * 3.75::DOUBLE AS alat,
      |    (n_nationkey // 13) * 21.6::DOUBLE - 90 AS alon
      |  FROM nation)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q52_airport_proximity" ->
      s"""WITH $airportsCte,
        |pts AS (
        |  SELECT event_id, user_id, event_type, value,
        |    value - 50 AS lat,
        |    CAST(json_extract_string(props, '$$.k') AS INTEGER) * 3.6::DOUBLE - 180 AS lon
        |  FROM events WHERE value <= 100),
        |cand AS (
        |  SELECT p.*, a.airport_code, a.akey, a.alat, a.alon,
        |    round(SQRT(POW(69.1 * (a.alat - p.lat), 2) +
        |      POW(69.1 * (a.alon - p.lon) * COS(RADIANS(p.lat)), 2)) * 10000) / 10000 AS dist_mi
        |  FROM pts p JOIN airports a
        |    ON p.lat BETWEEN a.alat - 4 AND a.alat + 4
        |   AND p.lon BETWEEN a.alon - 12 AND a.alon + 12),
        |nearest AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_id ORDER BY dist_mi, akey) AS rn,
        |    (degrees(atan2(sin(radians(lon - alon)) * cos(radians(lat)),
        |       cos(radians(alat)) * sin(radians(lat)) -
        |       sin(radians(alat)) * cos(radians(lat)) * cos(radians(lon - alon)))) + 360.0) % 360.0 AS brg
        |  FROM cand WHERE dist_mi <= 450),
        |octs AS (
        |  SELECT *,
        |    CASE WHEN brg < 22.5 THEN 'N' WHEN brg < 67.5 THEN 'NE'
        |         WHEN brg < 112.5 THEN 'E' WHEN brg < 157.5 THEN 'SE'
        |         WHEN brg < 202.5 THEN 'S' WHEN brg < 247.5 THEN 'SW'
        |         WHEN brg < 292.5 THEN 'W' WHEN brg < 337.5 THEN 'NW'
        |         ELSE 'N' END AS octant
        |  FROM nearest WHERE rn = 1),
        |${Pct.ctes("pq52", "octs", Seq("airport_code"), "dist_mi",
            Seq("q25" -> 0.25, "q75" -> 0.75))},
        |agged AS (
        |  SELECT airport_code,
        |    count(*) AS n_nearby,
        |    count(DISTINCT user_id) AS n_users,
        |    round(sum(dist_mi::DECIMAL(25,4))::DOUBLE / count(*) * 10000) / 10000 AS avg_dist_mi,
        |    round(min(dist_mi), 4) AS min_dist_mi,
        |    count(CASE WHEN value < 20 THEN 1 END) AS n_low_value,
        |    count(CASE WHEN value < 5 THEN 1 END) AS n_very_low,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |    count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |    count(CASE WHEN octant = 'N' THEN 1 END) AS n_north,
        |    count(CASE WHEN octant = 'S' THEN 1 END) AS n_south,
        |    count(CASE WHEN octant = 'E' THEN 1 END) AS n_east,
        |    count(CASE WHEN octant = 'W' THEN 1 END) AS n_west,
        |    count(CASE WHEN octant IN ('NE','NW') THEN 1 END) AS n_north_diag,
        |    count(CASE WHEN octant IN ('SE','SW') THEN 1 END) AS n_south_diag,
        |    round(coalesce(
        |      sum(CASE WHEN dist_mi < 100 THEN value END::DECIMAL(18,2))::DOUBLE /
        |        count(CASE WHEN dist_mi < 100 THEN 1 END), 0.0) * 100) / 100 AS avg_value_close
        |  FROM octs GROUP BY airport_code HAVING count(*) >= 5)
        |SELECT agged.*,
        |  round(q25 * 10000) / 10000 AS q25_dist_mi,
        |  round(q75 * 10000) / 10000 AS q75_dist_mi,
        |  round(n_nearby / 720.0 * 10000) / 10000 AS events_per_hour,
        |  round(100.0 * (n_purchase + n_signup) / n_nearby * 100) / 100 AS ops_pct,
        |  CASE WHEN round(n_nearby / 720.0 * 10000) / 10000 > 0.05 THEN 'High'
        |       WHEN round(n_nearby / 720.0 * 10000) / 10000 > 0.02 THEN 'Moderate'
        |       ELSE 'Low' END AS traffic_intensity,
        |  CASE WHEN n_north + n_north_diag > n_south + n_south_diag THEN 'North Dominant'
        |       WHEN n_south + n_south_diag > n_north + n_north_diag THEN 'South Dominant'
        |       ELSE 'Balanced N-S' END AS ns_pattern,
        |  CASE WHEN n_east > n_west THEN 'East Dominant'
        |       WHEN n_west > n_east THEN 'West Dominant'
        |       ELSE 'Balanced E-W' END AS ew_pattern
        |FROM agged JOIN pq52 USING (airport_code)
        |ORDER BY n_nearby DESC, airport_code""".stripMargin,

    // `+ 0.0` on the grid cells: DuckDB's round(double) keeps the sign of
    // the input (round(-0.004)*10 → -0.0) while Spark's BigDecimal-based
    // round emits +0.0; the two hash-compare as different values even
    // though they GROUP together. Adding positive zero normalizes -0.0.
    "q55_corridor_classify" ->
      """WITH pts AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t_us,
        |    value - 50 AS lat,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) * 3.6::DOUBLE - 180 AS lon
        |  FROM events WHERE value <= 150),
        |legs AS (
        |  SELECT *, lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
        |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |tracks0 AS (
        |  SELECT round(lat / 10) * 10 + 0.0 AS cell_lat, round(lon / 18) * 18 + 0.0 AS cell_lon,
        |    user_id,
        |    round(CASE WHEN plat IS NOT NULL THEN
        |      (degrees(atan2(sin(radians(lon - plon)) * cos(radians(lat)),
        |        cos(radians(plat)) * sin(radians(lat)) -
        |        sin(radians(plat)) * cos(radians(lat)) * cos(radians(lon - plon)))) + 360.0) % 360.0
        |      END * 100) / 100 AS track
        |  FROM legs),
        |tracks AS (
        |  SELECT cell_lat, cell_lon, user_id,
        |    CASE WHEN track = 360 THEN 0 ELSE track END AS track
        |  FROM tracks0),
        |cells AS (
        |  SELECT cell_lat, cell_lon, count(*) AS total_events,
        |    count(DISTINCT user_id) AS unique_users,
        |    count(track) AS n_legs,
        |    sum(track::DECIMAL(25,2))::DOUBLE AS sx,
        |    sum((track * track)::DECIMAL(25,4))::DOUBLE AS sx2
        |  FROM tracks GROUP BY cell_lat, cell_lon HAVING count(*) >= 8),
        |classified AS (
        |  SELECT *,
        |    round(total_events / 720.0 * 10000) / 10000 AS events_per_hour,
        |    round(sx / n_legs * 100) / 100 AS avg_heading,
        |    round(sqrt(greatest((sx2 - sx * sx / n_legs) / (n_legs - 1), 0.0)) * 10000) / 10000 AS heading_stddev
        |  FROM cells),
        |scored AS (
        |  SELECT *,
        |    round(1.0 / (1.0 + heading_stddev / 180.0) * 10000) / 10000 AS route_consistency,
        |    CASE WHEN cell_lat BETWEEN 30 AND 60 AND cell_lon BETWEEN -130 AND -60 THEN 'North America'
        |         WHEN cell_lat BETWEEN 40 AND 70 AND cell_lon BETWEEN -10 AND 40 THEN 'Europe'
        |         WHEN cell_lat BETWEEN 20 AND 50 AND cell_lon BETWEEN 100 AND 140 THEN 'East Asia'
        |         WHEN cell_lat BETWEEN 30 AND 50 AND cell_lon BETWEEN 40 AND 80 THEN 'Central Asia/Middle East'
        |         WHEN cell_lat BETWEEN -40 AND -10 AND cell_lon BETWEEN 110 AND 160 THEN 'Australia/Oceania'
        |         WHEN cell_lat BETWEEN -40 AND 10 AND cell_lon BETWEEN -80 AND -30 THEN 'South America'
        |         WHEN cell_lat BETWEEN -40 AND 40 AND cell_lon BETWEEN -20 AND 60 THEN 'Africa'
        |         ELSE 'Other/Oceanic' END AS geographic_region,
        |    CASE WHEN total_events > 80 THEN 'Major International Corridor'
        |         WHEN total_events > 60 THEN 'Regional Corridor'
        |         WHEN total_events > 40 THEN 'Secondary Route'
        |         ELSE 'Local Route' END AS corridor_type,
        |    CASE WHEN round(sx / n_legs * 100) / 100 < 45 OR round(sx / n_legs * 100) / 100 >= 315 THEN 'North'
        |         WHEN round(sx / n_legs * 100) / 100 < 135 THEN 'East'
        |         WHEN round(sx / n_legs * 100) / 100 < 225 THEN 'South'
        |         ELSE 'West' END AS primary_direction
        |  FROM classified)
        |SELECT rank() OVER (ORDER BY total_events DESC) AS corridor_rank,
        |  cell_lat, cell_lon, geographic_region, corridor_type, total_events,
        |  unique_users, events_per_hour, avg_heading, heading_stddev,
        |  route_consistency, primary_direction
        |FROM scored ORDER BY corridor_rank, cell_lat, cell_lon""".stripMargin,

    "q89_zorder_layout" ->
      s"""WITH pts AS (
        |  SELECT ((CAST(round(value * 100) AS BIGINT) + 4000) * 1024) // 18000 AS latq,
        |    (CAST(json_extract_string(props, '$$.k') AS BIGINT) * 1024) // 100 AS lonq
        |  FROM events WHERE value <= 100),
        |z AS (SELECT latq, lonq, ${zTerms("latq", "lonq", "//")} AS zkey FROM pts)
        |SELECT zkey // 16384 AS bucket, count(*) AS n,
        |  count(DISTINCT latq * 1024 + lonq) AS n_cells,
        |  max(latq) - min(latq) + 1 AS lat_span,
        |  max(lonq) - min(lonq) + 1 AS lon_span,
        |  (max(latq) - min(latq) + 1) * (max(lonq) - min(lonq) + 1) AS bbox_cells,
        |  round(100.0 * count(DISTINCT latq * 1024 + lonq) /
        |    ((max(latq) - min(latq) + 1) * (max(lonq) - min(lonq) + 1)) * 100) / 100
        |    AS fill_pct
        |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin,
  )
}
