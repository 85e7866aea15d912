package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Exprs, Pct}
import graft.quality.Quality

/** Dashboard/API read path (SURVEY.md §3.4) and imputation (§2.4 A10).
  *
  * The reference API samples ≤5000 records then scales counts back up
  * (get_flight_data.py:260-326) because one Lambda must answer in seconds;
  * in Spark the full aggregation is the same single job, so sampling is an
  * option, not a necessity — `sampleFraction` mirrors the semantics when a
  * sub-second dashboard needs it. */
object Dashboard {

  /** q35: one-pass dashboard stats — top-10 breakdowns + histogram + global
    * counters, the API's response shape as a small DataFrame. */
  def q35DashboardStats(spark: SparkSession, dir: String,
                        sampleFraction: Option[Double] = None): DataFrame = {
    val e0 = Tables.events(spark, dir)
    val e = sampleFraction.fold(e0)(f => e0.sample(f, seed = 42))
    // top-10 event types by count (the top-10-countries shape, A11)
    val topTypes = e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type")).limit(10)
      .select(lit("top_type").as("stat"), col("event_type").as("key"),
        col("n").cast("double").as("v"))
    // top-10 users by total value
    val topUsers = e.groupBy(col("user_id"))
      .agg(Exprs.dround(Exprs.sumExact2(col("value")), 2).as("total"))
      .orderBy(col("total").desc, col("user_id")).limit(10)
      .select(lit("top_user").as("stat"), col("user_id").cast("string").as("key"),
        col("total").as("v"))
    // 10-bucket value histogram on fixed [0, 100) buckets
    val hist = e.groupBy((floor(col("value") / 10) * 10).cast("int").as("b"))
      .agg(count(lit(1)).as("n"))
      .select(lit("hist").as("stat"), col("b").cast("string").as("key"),
        col("n").cast("double").as("v"))
    // global counters
    val globals = e.agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(explode(map(
        lit("total_events"), col("total_events").cast("double"),
        lit("n_users"), col("n_users").cast("double"))).as(Seq("key", "v")))
      .select(lit("global").as("stat"), col("key"), col("v"))
    topTypes.unionByName(topUsers).unionByName(hist).unionByName(globals)
      .orderBy(col("stat"), col("key"))
  }

  /** q36 (A10): deterministic mode/mean imputation values per group — mode
    * via count + row_number with an explicit tie-break (both engines agree,
    * unlike builtin mode() whose tie choice is engine-specific). */
  def q36ImputationValues(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val typeCounts = e.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("n").desc, col("event_type"))
    val modes = typeCounts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("mode_type"))
    val means = e.groupBy(col("user_id"))
      .agg(Exprs.avgExact2(col("value"), 4).as("mean_value"))
    modes.join(means, "user_id").orderBy(col("user_id"))
  }

  /** q46 (A4 approximate path, reference 07:114-185 APPROX_PERCENTILE):
    * approximate percentiles next to their exact counterparts — sketches
    * differ across engines so this is rows-only; the spec bounds the
    * relative error against the exact values computed in the same pass. */
  def q46ApproxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("event_type")).agg(
        Exprs.dround(expr("percentile(value, 0.5)"), 4).as("exact_p50"),
        Exprs.dround(expr("percentile_approx(value, 0.5, 1000)"), 4).as("approx_p50"),
        Exprs.dround(expr("percentile(value, 0.95)"), 4).as("exact_p95"),
        Exprs.dround(expr("percentile_approx(value, 0.95, 1000)"), 4).as("approx_p95"))
      .orderBy(col("event_type"))
  }

  /** Pinned dashboard "now" INSIDE the data window (2024-01-30 23:30:00 UTC,
    * 27 min before the last event) so current-hour/prev-hour/rolling-window
    * metrics are non-empty and deterministic. The reference views use
    * `current_timestamp` (06_analytics_views.sql:336,516); here it is a
    * parameter, matching the SURVEY §7 rule that "now" never comes from the
    * engine clock. */
  val DashNowEpoch = 1706657400L
  private val HourStart  = 1706655600L // 2024-01-30 23:00:00
  private val PrevStart  = 1706652000L // 2024-01-30 22:00:00
  private val DayStart   = 1706572800L // 2024-01-30 00:00:00

  /** q53: real-time metrics view — reference
    * `sql/athena/06_analytics_views.sql:329-495` (realtime_flight_metrics):
    * current-hour snapshot, previous-hour trend context and today-cumulative
    * context as three single-row aggregates combined ON 1=1, plus the
    * trend/intensity/health CASE ladders. Three partition-pruned scans at
    * scale (hour-partitioned sink), each collapsing to one row — the
    * cross joins are broadcast-trivial. */
  def q53RealtimeMetrics(spark: SparkSession, dir: String): DataFrame = {
    val tsS = expr("ts_ns div 1000000000")
    val k = get_json_object(col("props"), "$.k").cast("int")
    // range filters via eventsInRange: applied to the RAW physical ts column
    // (whatever its encoding) so they reach the parquet scan as
    // PushedFilters — the whole point of a "current hour" view at 100 TB is
    // reading one hour, not the corpus
    def tsRange(fromS: Long, untilS: Long): DataFrame =
      Tables.eventsInRange(spark, dir, Some(fromS), Some(untilS))

    val cur = tsRange(HourStart, HourStart + 3600).agg(
      count(lit(1)).as("current_hour_events"),
      countDistinct(col("user_id")).as("current_hour_users"),
      count(when(col("event_type") =!= "error", 1)).as("active_events"),
      count(when(col("event_type") === "error", 1)).as("error_events"),
      Exprs.avgExact2(col("value"), 2).as("avg_value"),
      max(col("value")).as("max_value"),
      count(when(col("event_type") === "click", 1)).as("n_click"),
      count(when(col("event_type") === "view", 1)).as("n_view"),
      count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
      count(when(col("event_type") === "signup", 1)).as("n_signup"),
      countDistinct(k).as("distinct_cells"),
      count(when(tsS >= DashNowEpoch - 300, 1)).as("fresh_events"),
      count(when(col("value") > 400, 1)).as("high_value_events"))

    val prev = tsRange(PrevStart, HourStart).agg(
      count(lit(1)).as("prev_hour_events"),
      count(when(col("event_type") =!= "error", 1)).as("prev_active"),
      Exprs.avgExact2(col("value"), 2).as("prev_avg_value"))

    val day = tsRange(DayStart, DayStart + 86400).agg(
      count(lit(1)).as("today_events"),
      countDistinct(col("user_id")).as("today_users"),
      max(col("value")).as("today_max_value"))

    cur.crossJoin(broadcast(prev)).crossJoin(broadcast(day))
      .withColumn("current_hour_label", lit("2024-01-30 23:00"))
      .withColumn("events_per_minute",
        Exprs.dround(col("current_hour_events") / lit(60.0), 2))
      .withColumn("active_pct",
        Exprs.pctOf(col("active_events"), col("current_hour_events"), 1))
      .withColumn("hourly_change",
        col("current_hour_events") - col("prev_hour_events"))
      // ±10% trend band in exact integer arithmetic: 1.1*prev as a double
      // literal product sits exactly on the comparison boundary when
      // 10*cur == 11*prev, and DuckDB's 1.1 is DECIMAL — integers dodge both
      .withColumn("traffic_trend",
        when(col("current_hour_events") * 10 > col("prev_hour_events") * 11,
          "Increasing")
          .when(col("current_hour_events") * 10 < col("prev_hour_events") * 9,
            "Decreasing")
          .otherwise("Stable"))
      .withColumn("active_change", col("active_events") - col("prev_active"))
      .withColumn("hour_share_of_day",
        Exprs.pctOf(col("current_hour_events"), col("today_events"), 1))
      .withColumn("freshness_pct",
        Exprs.pctOf(col("fresh_events"), col("current_hour_events"), 1))
      .withColumn("system_health",
        when(col("freshness_pct") >= 80, "Excellent")
          .when(col("freshness_pct") >= 60, "Good")
          .when(col("freshness_pct") >= 40, "Fair")
          .otherwise("Poor"))
      .withColumn("traffic_intensity",
        when(col("current_hour_events") > 30, "Peak Traffic")
          .when(col("current_hour_events") > 20, "High Traffic")
          .when(col("current_hour_events") > 12, "Moderate Traffic")
          .when(col("current_hour_events") > 6, "Light Traffic")
          .otherwise("Minimal Traffic"))
  }

  /** q54: data-quality dashboard view — reference
    * `sql/athena/06_analytics_views.sql:497-575` (data_quality_dashboard):
    * 4-hour rolling quality window + current-hour snapshot + completeness /
    * validity counters + alert booleans, all conditional aggregates in ONE
    * scan of the last-24h slice (partition-pruned at scale). Per-row score
    * comes from the same pinned-now scoring pass as q28/q29. */
  def q54QualityDashboard(spark: SparkSession, dir: String): DataFrame = {
    val now = DashNowEpoch
    val tsS = expr("ts_ns div 1000000000")
    val k = get_json_object(col("props"), "$.k").cast("int")
    // 24h slice via eventsInRange: the bound rides the raw ts column so it
    // is pushed to the scan under every physical encoding
    val scored = Quality.scoreColumns(lit(now))
      .foldLeft(Tables.eventsInRange(spark, dir, Some(now - 86400), None)) {
        case (df, (name, c)) => df.withColumn(name, c)
      }
    val in4h = tsS >= now - 14400
    val inHour = tsS >= HourStart && tsS < HourStart + 3600
    def cnt(c: Column) = count(when(c, 1))
    val s = col("quality_score")
    scored.agg(
        count(lit(1)).as("total_records"),
        Exprs.dround(Exprs.sumExact(when(in4h, s), 6) / cnt(in4h), 6)
          .as("last_4h_avg_quality"),
        Exprs.dround(min(when(in4h, s)), 6).as("last_4h_min_quality"),
        cnt(in4h && s < 0.7).as("last_4h_poor_count"),
        cnt(in4h).as("last_4h_total"),
        Exprs.dround(Exprs.sumExact(when(inHour, s), 6) / cnt(inHour), 6)
          .as("current_hour_avg_quality"),
        cnt(inHour && s >= 0.9).as("current_hour_excellent"),
        cnt(inHour).as("current_hour_total"),
        cnt(col("user_id").isNull).as("missing_user_count"),
        cnt(col("value").isNull || k.isNull).as("missing_position_count"),
        cnt(col("props").isNull).as("missing_props_count"),
        cnt(col("value") < 0 || col("value") > 1000).as("invalid_value_count"),
        cnt(col("event_type").isNotNull && !col("event_type")
          .isin("click", "view", "purchase", "signup", "error"))
          .as("invalid_type_count"))
      .withColumn("dashboard_date", lit("2024-01-30"))
      .withColumn("last_4h_poor_pct",
        Exprs.pctOf(col("last_4h_poor_count"), col("last_4h_total"), 2))
      .withColumn("current_hour_excellent_pct",
        Exprs.pctOf(col("current_hour_excellent"), col("current_hour_total"), 2))
      .withColumn("missing_user_pct",
        Exprs.pctOf(col("missing_user_count"), col("total_records"), 3))
      .withColumn("missing_position_pct",
        Exprs.pctOf(col("missing_position_count"), col("total_records"), 3))
      .withColumn("quality_status_flag",
        when(col("last_4h_avg_quality") >= 0.9, "EXCELLENT")
          .when(col("last_4h_avg_quality") >= 0.8, "GOOD")
          .when(col("last_4h_avg_quality") >= 0.7, "FAIR")
          .when(col("last_4h_avg_quality") >= 0.6, "POOR")
          .otherwise("CRITICAL"))
      .withColumn("quality_alert",
        col("last_4h_poor_count") * 10 > col("last_4h_total"))
      .withColumn("missing_data_alert",
        col("missing_user_count") * 50 > col("total_records"))
  }

  /** q56: API sampling scale-up estimation — the reference API answers from
    * a ≤5000-record sample and multiplies counts back by the sampling factor
    * (`get_flight_data.py:260-270,319-326`). Sample membership is
    * `event_id % 10 = 0` — deterministic and engine-portable, unlike
    * `rand()`/`TABLESAMPLE` — and estimates sit next to exact counts from
    * the SAME single scan so the estimation error is itself part of the
    * contract. At scale only the sampled aggregates would run (that is the
    * point of sampling); the exact side here is the verification harness. */
  def q56SamplingEstimate(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val inSample = col("event_id") % 10 === 0
    e.groupBy(col("event_type")).agg(
        count(lit(1)).as("actual_n"),
        count(when(inSample, 1)).as("sampled_n"),
        Exprs.avgExact2(col("value"), 2).as("actual_avg_value"),
        Exprs.dround(
          Exprs.sumExact2(when(inSample, col("value"))) /
            count(when(inSample, col("value"))), 2).as("sampled_avg_value"))
      .withColumn("sampling_factor", lit(10))
      .withColumn("estimated_n", col("sampled_n") * 10)
      .withColumn("estimate_err_pct", Exprs.dround(
        lit(100.0) * (col("estimated_n") - col("actual_n")) / col("actual_n"), 2))
      .orderBy(col("event_type"))
  }

  /** q103: query-cost audit — the reference's top-25-most-expensive-queries
    * monitor (`sql/athena/07_optimization_guide.sql:449-480`: bytes
    * scanned, the $5/TB cost estimate, MB/s throughput, ordered by spend).
    * No query-history table exists in this environment, so the log is
    * DERIVED deterministically from events — one synthetic "query" per
    * (event_type, day): bytes = Σ(octet_length(props)+64) and millis =
    * 50 + avg-value-cents (exact decimal→BIGINT, floor div) — which keeps
    * every audit metric integer-derived and oracle-exact while the audit
    * expressions themselves mirror the reference formulas (gb and cost at
    * 6dp rather than 2dp: test-scale logs are KB-sized, 2dp would round
    * everything to 0.00 at the same formula).
    *
    * Scale shape: one hash aggregation at the (type, day) grain with
    * map-side combine, then a 25-row TakeOrderedAndProject — a real
    * query-history table drops in for `log` with zero plan change. */
  def q103QueryCostAudit(spark: SparkSession, dir: String): DataFrame = {
    val day = expr("ts_ns div 1000 div 86400000000")
    val log = Tables.events(spark, dir)
      .groupBy(col("event_type"), day.as("day"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(octet_length(col("props")) + 64).as("data_scanned_in_bytes"),
        expr("50 + (cast(sum(cast(value as decimal(18,2)) * 100) as bigint)" +
          " div count(1))").as("execution_time_in_millis"))
      .withColumn("query_id",
        concat(col("event_type"), lit("@"), col("day")))
    log.select(
        col("query_id"), col("n_rows"), col("data_scanned_in_bytes"),
        Exprs.dround(col("data_scanned_in_bytes") / lit(1073741824.0), 6)
          .as("data_scanned_gb"),
        Exprs.dround(col("data_scanned_in_bytes") / lit(1073741824.0) * 5.0, 6)
          .as("estimated_cost_usd"),
        col("execution_time_in_millis"),
        Exprs.dround(col("execution_time_in_millis") / lit(1000.0), 2)
          .as("execution_time_seconds"),
        Exprs.dround((col("data_scanned_in_bytes") / lit(1048576.0)) /
          (col("execution_time_in_millis") / lit(1000.0)), 2)
          .as("mb_per_second"))
      .orderBy(col("data_scanned_in_bytes").desc, col("query_id"))
      .limit(25)
  }

  /** q129: partition/scan-efficiency audit — the companion relation to
    * q103's spend audit, and the last uncovered reference delta
    * (`query_optimizer.py:276-420` `analyze_partition_efficiency` +
    * `analyze_column_projection`): per audited query, does each of its
    * parquet scans prune partitions, push filters to the reader, and read
    * only the columns it needs? The reference mines Athena query history
    * for these facts; Spark's physical plan states them directly
    * ([[graft.ops.PlanAudit]]), so the audit is a plan walk over a
    * representative query set — nothing executes.
    *
    * The set spans the scan archetypes: pure full-table aggregates
    * (q01/q03 — full_scan, heavily column-pruned), derived-column grouping
    * (q14 — a filterless scan by construction), dimension joins (q07),
    * a derived-predicate text filter (q48 — quality ratios are computed
    * columns, so nothing CAN push; the audit shows that honestly), and the
    * time-ranged dashboard (q53 — the `Tables.eventsInRange` contract is
    * visible as filter_pushdown on every events scan). On the flat test
    * parquet there are no hive partitions, so partition_filtered is
    * truthfully false everywhere; on the hour-partitioned sink (S5/S8
    * specs) the same walk reports partition_pruned.
    *
    * No SQL oracle: the rows are plan facts DuckDB cannot recompute —
    * rows-only in the driver gate, pinned by PlanAuditSpec. */
  def q129PartitionAudit(spark: SparkSession, dir: String): DataFrame = {
    val audited: Seq[(String, DataFrame)] = Seq(
      "q01_overview" -> CoreQueries.q01Overview(spark, dir),
      "q03_hourly_trend" -> CoreQueries.q03HourlyTrend(spark, dir),
      "q07_segment_performance" -> JoinQueries.q07SegmentPerformance(spark, dir),
      "q14_props_json" -> JoinQueries.q14PropsJson(spark, dir),
      "q48_quality_filter" -> graft.text.TextOps.q48QualityFilter(spark, dir),
      "q53_realtime_metrics" -> q53RealtimeMetrics(spark, dir))
    val rows = audited.flatMap { case (n, df) =>
      graft.ops.PlanAudit.auditScans(n, df)
    }
    spark.createDataFrame(rows)
      .orderBy(col("query_id"), col("scan_idx"))
  }

  /** q130: load-test latency capture — the reference's per-snapshot metrics
    * record (`load_testing/load_test_framework.py:71-86` MetricsSnapshot:
    * requests sent, successes/failures, latency p50/p95/p99, error rate) as
    * a per-service relation, closing the last "What's missing" entry of
    * VERDICT r8 (#3). No load harness runs here, so the request log is
    * DERIVED deterministically from events (the q103 synthetic-log rule):
    * one request per event, service = event_type, latency_ms = 50 +
    * (value-cents mod 900) — an exact-decimal BIGINT on a bounded integer
    * grid — and a 2% failure plant (event_id % 50 = 0).
    *
    * The percentiles are exact order statistics over the latency grid
    * ([[graft.ops.Pct]], keyed by service) — engine-version robust, so the
    * whole snapshot carries a full DuckDB oracle where the reference's
    * numpy percentiles have none.
    *
    * Scale shape: one map-side-combined aggregation per service plus the
    * Pct grid pass (≤900 cells per service) — no fact-table window, no
    * join blow-up; a real request log drops in for `req` unchanged. */
  def q130LatencyProfile(spark: SparkSession, dir: String): DataFrame = {
    val req = Tables.events(spark, dir)
      .withColumn("service", col("event_type"))
      .withColumn("latency_ms",
        expr("50 + (cast(cast(value as decimal(18,2)) * 100 as bigint) % 900)"))
      .withColumn("failed", col("event_id") % 50 === 0)
    val pct = Pct.relation(req, Seq("service"), "latency_ms",
      Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99))
    req.groupBy(col("service")).agg(
        count(lit(1)).as("requests"),
        count(when(!col("failed"), 1)).as("successful_requests"),
        count(when(col("failed"), 1)).as("failed_requests"),
        Exprs.dround(count(when(col("failed"), 1)) / count(lit(1)), 6)
          .as("error_rate"),
        Exprs.dround(sum(col("latency_ms")) / count(lit(1)), 4)
          .as("avg_latency_ms"),
        max(col("latency_ms")).as("max_latency_ms"))
      .join(broadcast(pct), "service")
      .select(col("service"), col("requests"), col("successful_requests"),
        col("failed_requests"), col("error_rate"), col("avg_latency_ms"),
        col("max_latency_ms"),
        Exprs.dround(col("p50"), 4).as("latency_p50"),
        Exprs.dround(col("p95"), 4).as("latency_p95"),
        Exprs.dround(col("p99"), 4).as("latency_p99"))
      .orderBy(col("service"))
  }

  /** q133: cache-opportunity recommendations — the reference optimizer's
    * `analyze_caching_opportunities` (`cost-optimization/query-optimization/
    * query_optimizer.py:510-601`: normalize query texts to patterns, keep
    * patterns seen ≥2 times, tier an estimated hit rate by frequency
    * (≥10→0.8, ≥5→0.6, else 0.4), pick a cache strategy by avg cost / avg
    * execution time, estimate monthly savings = total_cost·hit_rate·4, and
    * recommend when savings exceed \$10/month).
    *
    * The query log is the q103 synthetic rule at the (event_type, day)
    * grain; the reference's text normalization collapses a query family
    * that differs only in its date literal onto one pattern, which here is
    * exactly `event_type`. The reference FILTERS to savings > \$10; at test
    * scale that cut would empty the relation, so the cut ships as the
    * `recommended` flag and the rows stay deterministic at any SF — same
    * information, stable cardinality.
    *
    * Every derived number is integer arithmetic (micro-USD via canonical
    * two-step floor division, threshold compares as cross-multiplies on
    * BIGINTs) so the oracle is hash-exact. Overflow bound: the savings
    * product `total_bytes · hit_pct · 200000` stays in Long up to
    * ~536 GiB scanned per pattern at the 80% tier (9.2e18 / 1.6e7); past
    * that the same expression rides DECIMAL(38,0) unchanged.
    *
    * Scale shape: two stacked map-side-combined hash aggregations
    * ((type, day) then type) and a presentation sort on a ≤|event types|
    * relation — a real query-history table drops in for `log` with the
    * pattern normalization as one extra projection. */
  def q133CacheRecommendations(spark: SparkSession, dir: String): DataFrame = {
    val day = expr("ts_ns div 1000 div 86400000000")
    val log = Tables.events(spark, dir)
      .groupBy(col("event_type"), day.as("day"))
      .agg(
        sum(octet_length(col("props")) + 64).as("bytes"),
        expr("50 + (cast(sum(cast(value as decimal(18,2)) * 100) as bigint)" +
          " div count(1))").as("millis"))
    cacheRecommendationsFrom(log)
  }

  /** q133 body over a (event_type, bytes, millis) per-execution log — the
    * planted-log surface CacheRecsSpec drives the strategy ladder and
    * recommendation cut through. */
  def cacheRecommendationsFrom(log: DataFrame): DataFrame =
    log.groupBy(col("event_type").as("query_pattern"))
      .agg(count(lit(1)).as("frequency"),
        sum(col("bytes")).as("total_bytes"),
        sum(col("millis")).as("total_millis"))
      .filter(col("frequency") >= 2) // unique queries cannot cache-hit
      .withColumn("est_hit_rate_pct",
        when(col("frequency") >= 10, lit(80L))
          .when(col("frequency") >= 5, lit(60L)).otherwise(lit(40L)))
      // strategy ladder as integer cross-multiplies (never avg-then-compare
      // on doubles): avg cost > $10 ⇔ bytes·5 > 10·2³⁰·freq at $5/TiB-ish
      // (the q103 constant); avg millis > 60000 ⇔ Σmillis > 60000·freq
      .withColumn("cache_strategy",
        when(col("total_bytes") * lit(5L) >
            lit(10L) * lit(1073741824L) * col("frequency"),
          lit("redis_ttl_freshness"))
        .when(col("total_millis") > lit(60000L) * col("frequency"),
          lit("elasticache_24h_ttl"))
        .otherwise(lit("app_level_1h_ttl")))
      .withColumn("avg_cost_microusd",
        expr("(total_bytes * 5000000) div 1073741824 div frequency"))
      // monthly = cost·hit·4 in micro-USD: bytes·5·(pct/100)·4·10⁶ / 2³⁰
      //         = bytes·pct·200000 div 2³⁰ (floor, canonical order)
      .withColumn("monthly_savings_microusd",
        expr("(total_bytes * est_hit_rate_pct * 200000) div 1073741824"))
      .withColumn("recommended",
        col("monthly_savings_microusd") > lit(10000000L)) // the $10 cut
      .select(col("query_pattern"), col("frequency"), col("total_bytes"),
        col("avg_cost_microusd"), col("est_hit_rate_pct"),
        col("cache_strategy"), col("monthly_savings_microusd"),
        col("recommended"))
      .orderBy(col("monthly_savings_microusd").desc, col("query_pattern"))

  /** q137: cost-monitoring dashboard — the reference's
    * `cost-optimization/monitoring/cost_dashboard.py`: per-service spend for
    * the current vs previous period with change% (`get_service_cost_breakdown`,
    * :228-317), cost per million processed records (`get_daily_cost_metrics`,
    * :91-140), and budget alerting with the severity bands of
    * `get_budget_alerts` (:376-450: ≥90% spent or ≥100% forecast → critical,
    * ≥80%/≥90% → high, ≥60% → medium). The reference SKIPS un-alerted
    * budgets; here they ship as severity 'none' for stable cardinality
    * (the q133 flag-not-filter rule).
    *
    * DELIBERATE alert_type deviation: the reference's critical branch
    * labels every critical alert `current >= 100 ? budget_exceeded :
    * forecast_exceeded` — so spend in [90,100) with forecast < 100 (critical
    * purely on spend) is called "forecast_exceeded" even though the
    * forecast is fine. This ladder instead names the condition that fired:
    * budget_exceeded iff spend ≥ 100, forecast_exceeded iff forecast ≥ 100,
    * else the approaching/early bands — so a spend-only critical reads
    * approaching_limit. Severity always matches the reference; only the
    * label wording differs, and only in that corner.
    *
    * Spend is the q103 synthetic rule ($5/TiB of bytes scanned) at the
    * (service=event_type, day) grain; the current period is the last 4
    * days of the corpus window and the previous period the rest, split on
    * a data-relative max(day) (pinned-now rule — never wall clock). The
    * budget is PLANTED from the service name (the q134 plant rule class)
    * and the forecast projects the 4-day window onto the 7-day budget
    * period (×7/4, floor). change% is a sign-split half-up division —
    * spend can shrink. All BIGINT, oracle hash-exact.
    *
    * Scale shape: one fact-grain aggregation to (service, day), a 1-row
    * max-day broadcast (J4), one service-grain rollup — the q133/q134
    * two-stack shape plus the broadcast. */
  def q137CostDashboard(spark: SparkSession, dir: String): DataFrame = {
    val day = expr("ts_ns div 1000 div 86400000000")
    val log = Tables.events(spark, dir)
      .groupBy(col("event_type"), day.as("day"))
      .agg(count(lit(1)).as("n_rows"),
        sum(octet_length(col("props")) + 64).as("bytes"))
    costDashboardFrom(log)
  }

  /** q137 formula strings, rendered per dialect ([[graft.analytics.Roi]]
    * convention: one generator, zero drift). */
  def costDashboardFormulas(divOp: String): Map[String, String] = Map(
    "change_x100" -> // period-over-period spend change, sign-split half-up
      s"""CASE WHEN prev_cost_microusd > 0 THEN
         |  CASE WHEN cur_cost_microusd >= prev_cost_microusd THEN
         |    (2 * (cur_cost_microusd - prev_cost_microusd) * 10000
         |      + prev_cost_microusd) $divOp (2 * prev_cost_microusd)
         |  ELSE -((2 * (prev_cost_microusd - cur_cost_microusd) * 10000
         |      + prev_cost_microusd) $divOp (2 * prev_cost_microusd)) END
         | ELSE CASE WHEN cur_cost_microusd = 0 THEN 0 ELSE 10000 END
         | END""".stripMargin,
    "cost_per_million_microusd" ->
      s"""CASE WHEN cur_records > 0
         | THEN (cur_cost_microusd * 1000000) $divOp cur_records
         | ELSE 0 END""".stripMargin,
    "budget_microusd" -> // planted per-service budget, name-derived
      "500 + (length(service) * 137) % 1500",
    "spend_pct" -> s"(cur_cost_microusd * 100) $divOp budget_microusd",
    // the reference's forecast comes from an INDEPENDENT forecasting API;
    // a pure spend×constant projection would make the medium band dead
    // code (forecast >= 100 always fires first), so the forecast rides a
    // planted per-service multiplier in [1.0x, 2.0x) of spend
    "forecast_pct" ->
      s"(spend_pct * (100 + (length(service) * 53) % 100)) $divOp 100",
    "severity" ->
      """CASE WHEN spend_pct >= 90 OR forecast_pct >= 100 THEN 'critical'
        | WHEN spend_pct >= 80 OR forecast_pct >= 90 THEN 'high'
        | WHEN spend_pct >= 60 THEN 'medium' ELSE 'none' END""".stripMargin,
    "alert_type" ->
      """CASE WHEN spend_pct >= 100 THEN 'budget_exceeded'
        | WHEN forecast_pct >= 100 THEN 'forecast_exceeded'
        | WHEN spend_pct >= 80 OR forecast_pct >= 90 THEN 'approaching_limit'
        | WHEN spend_pct >= 60 THEN 'early_warning' ELSE 'none' END""".stripMargin)

  /** q137 body over a (event_type, day, n_rows, bytes) spend log — the
    * planted-log surface CostDashboardSpec drives the alert bands through. */
  def costDashboardFrom(log: DataFrame): DataFrame = {
    val f = costDashboardFormulas("div")
    // max_day as an unpartitioned window over the ALREADY-AGGREGATED log
    // (~|services|·|days| rows): a separate agg + crossJoin re-computed the
    // whole fact-grain aggregation per consumer (4 parquet scans measured);
    // the window keeps it at one scan, and single-partitioning a post-agg
    // relation this small is free
    val allW = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val per = log.withColumn("max_day", max(col("day")).over(allW))
      .withColumn("cost_microusd", expr("(bytes * 5000000) div 1073741824"))
      .withColumn("in_cur", col("day") >= col("max_day") - 3)
      .groupBy(col("event_type").as("service"))
      .agg(
        sum(when(col("in_cur"), col("cost_microusd")).otherwise(0L))
          .as("cur_cost_microusd"),
        sum(when(!col("in_cur"), col("cost_microusd")).otherwise(0L))
          .as("prev_cost_microusd"),
        sum(when(col("in_cur"), col("n_rows")).otherwise(0L)).as("cur_records"))
    Seq("change_x100", "cost_per_million_microusd", "budget_microusd",
        "spend_pct", "forecast_pct", "severity", "alert_type")
      .foldLeft(per) { (d, c) => d.withColumn(c, expr(f(c))) }
      .select(col("service"), col("cur_cost_microusd"),
        col("prev_cost_microusd"), col("change_x100"), col("cur_records"),
        col("cost_per_million_microusd"),
        col("budget_microusd").cast("long").as("budget_microusd"),
        col("spend_pct"), col("forecast_pct"), col("severity"),
        col("alert_type"))
      .orderBy(col("cur_cost_microusd").desc, col("service"))
  }

  val oracle: Map[String, String] = Map(
    "q137_cost_dashboard" -> {
      val f = costDashboardFormulas("//")
      s"""WITH log AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |    count(*)::BIGINT AS n_rows,
         |    sum(octet_length(encode(props)) + 64)::BIGINT AS bytes
         |  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000),
         |md AS (SELECT max(day) AS max_day FROM log),
         |per AS (
         |  SELECT event_type AS service,
         |    sum(CASE WHEN day >= max_day - 3
         |        THEN (bytes * 5000000) // 1073741824 ELSE 0 END)::BIGINT
         |      AS cur_cost_microusd,
         |    sum(CASE WHEN day < max_day - 3
         |        THEN (bytes * 5000000) // 1073741824 ELSE 0 END)::BIGINT
         |      AS prev_cost_microusd,
         |    sum(CASE WHEN day >= max_day - 3 THEN n_rows ELSE 0 END)::BIGINT
         |      AS cur_records
         |  FROM log, md GROUP BY event_type),
         |d1 AS (SELECT *, ${f("change_x100")} AS change_x100,
         |  ${f("cost_per_million_microusd")} AS cost_per_million_microusd,
         |  (${f("budget_microusd")})::BIGINT AS budget_microusd FROM per),
         |d2 AS (SELECT *, ${f("spend_pct")} AS spend_pct FROM d1),
         |d3 AS (SELECT *, ${f("forecast_pct")} AS forecast_pct FROM d2)
         |SELECT service, cur_cost_microusd, prev_cost_microusd,
         |  change_x100::BIGINT AS change_x100, cur_records,
         |  cost_per_million_microusd::BIGINT AS cost_per_million_microusd,
         |  budget_microusd, spend_pct::BIGINT AS spend_pct,
         |  forecast_pct::BIGINT AS forecast_pct,
         |  ${f("severity")} AS severity, ${f("alert_type")} AS alert_type
         |FROM d3 ORDER BY cur_cost_microusd DESC, service""".stripMargin
    },

    "q133_cache_recommendations" ->
      """WITH log AS (
        |  SELECT event_type,
        |    sum(octet_length(encode(props)) + 64)::BIGINT AS bytes,
        |    50 + (sum(value::DECIMAL(18,2) * 100)::BIGINT // count(*))
        |      AS millis
        |  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000),
        |pat AS (
        |  SELECT event_type AS query_pattern, count(*)::BIGINT AS frequency,
        |    sum(bytes)::BIGINT AS total_bytes,
        |    sum(millis)::BIGINT AS total_millis
        |  FROM log GROUP BY event_type HAVING count(*) >= 2),
        |rec AS (
        |  SELECT query_pattern, frequency, total_bytes,
        |    (total_bytes * 5000000) // 1073741824 // frequency
        |      AS avg_cost_microusd,
        |    (CASE WHEN frequency >= 10 THEN 80 WHEN frequency >= 5 THEN 60
        |          ELSE 40 END)::BIGINT AS est_hit_rate_pct,
        |    CASE WHEN total_bytes * 5 >
        |           10::BIGINT * 1073741824::BIGINT * frequency
        |         THEN 'redis_ttl_freshness'
        |         WHEN total_millis > 60000::BIGINT * frequency
        |         THEN 'elasticache_24h_ttl'
        |         ELSE 'app_level_1h_ttl' END AS cache_strategy,
        |    total_millis
        |  FROM pat)
        |SELECT query_pattern, frequency, total_bytes, avg_cost_microusd,
        |  est_hit_rate_pct, cache_strategy,
        |  (total_bytes * est_hit_rate_pct * 200000) // 1073741824
        |    AS monthly_savings_microusd,
        |  (total_bytes * est_hit_rate_pct * 200000) // 1073741824 > 10000000
        |    AS recommended
        |FROM rec
        |ORDER BY monthly_savings_microusd DESC, query_pattern""".stripMargin,

    "q130_latency_profile" ->
      s"""WITH req AS (
        |  SELECT event_type AS service, event_id,
        |    50 + ((value::DECIMAL(18,2) * 100)::BIGINT % 900) AS latency_ms,
        |    (event_id % 50 = 0) AS failed
        |  FROM events),
        |${Pct.ctes("lp", "req", Seq("service"), "latency_ms",
            Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99))},
        |agg AS (
        |  SELECT service, count(*) AS requests,
        |    count(CASE WHEN NOT failed THEN 1 END) AS successful_requests,
        |    count(CASE WHEN failed THEN 1 END) AS failed_requests,
        |    round(count(CASE WHEN failed THEN 1 END) / count(*) * 1000000)
        |      / 1000000 AS error_rate,
        |    round(sum(latency_ms)::BIGINT / count(*) * 10000) / 10000
        |      AS avg_latency_ms,
        |    max(latency_ms) AS max_latency_ms
        |  FROM req GROUP BY service)
        |SELECT service, requests, successful_requests, failed_requests,
        |  error_rate, avg_latency_ms, max_latency_ms,
        |  round(p50 * 10000) / 10000 AS latency_p50,
        |  round(p95 * 10000) / 10000 AS latency_p95,
        |  round(p99 * 10000) / 10000 AS latency_p99
        |FROM agg JOIN lp USING (service) ORDER BY service""".stripMargin,

    "q103_query_cost_audit" ->
      """WITH log AS (
        |  SELECT event_type || '@' ||
        |      (epoch_us(ts) // 86400000000)::VARCHAR AS query_id,
        |    count(*) AS n_rows,
        |    sum(octet_length(encode(props)) + 64)::BIGINT
        |      AS data_scanned_in_bytes,
        |    50 + (sum(value::DECIMAL(18,2) * 100)::BIGINT // count(*))
        |      AS execution_time_in_millis
        |  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000)
        |SELECT query_id, n_rows, data_scanned_in_bytes,
        |  round(data_scanned_in_bytes / 1073741824.0 * 1000000) / 1000000
        |    AS data_scanned_gb,
        |  round(data_scanned_in_bytes / 1073741824.0 * 5.0 * 1000000) / 1000000
        |    AS estimated_cost_usd,
        |  execution_time_in_millis,
        |  round(execution_time_in_millis / 1000.0 * 100) / 100
        |    AS execution_time_seconds,
        |  round((data_scanned_in_bytes / 1048576.0) /
        |    (execution_time_in_millis / 1000.0) * 100) / 100 AS mb_per_second
        |FROM log
        |ORDER BY data_scanned_in_bytes DESC, query_id
        |LIMIT 25""".stripMargin,
    "q56_sampling_estimate" ->
      """SELECT event_type, count(*) AS actual_n,
        |  count(CASE WHEN event_id % 10 = 0 THEN 1 END) AS sampled_n,
        |  round(sum(value::DECIMAL(25,2))::DOUBLE / count(value) * 100) / 100 AS actual_avg_value,
        |  round(sum((CASE WHEN event_id % 10 = 0 THEN value END)::DECIMAL(25,2))::DOUBLE /
        |    count(CASE WHEN event_id % 10 = 0 THEN value END) * 100) / 100 AS sampled_avg_value,
        |  10 AS sampling_factor,
        |  count(CASE WHEN event_id % 10 = 0 THEN 1 END) * 10 AS estimated_n,
        |  round(100.0 * (count(CASE WHEN event_id % 10 = 0 THEN 1 END) * 10 - count(*)) / count(*) * 100) / 100 AS estimate_err_pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q53_realtime_metrics" ->
      """WITH cur AS (
        |  SELECT count(*) AS current_hour_events,
        |    count(DISTINCT user_id) AS current_hour_users,
        |    count(CASE WHEN event_type <> 'error' THEN 1 END) AS active_events,
        |    count(CASE WHEN event_type = 'error' THEN 1 END) AS error_events,
        |    round(sum(value::DECIMAL(25,2))::DOUBLE / count(value) * 100) / 100 AS avg_value,
        |    max(value) AS max_value,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |    count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |    count(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER)) AS distinct_cells,
        |    count(CASE WHEN epoch_us(ts) // 1000000 >= 1706657100 THEN 1 END) AS fresh_events,
        |    count(CASE WHEN value > 400 THEN 1 END) AS high_value_events
        |  FROM events
        |  WHERE epoch_us(ts) // 1000000 >= 1706655600 AND epoch_us(ts) // 1000000 < 1706659200),
        |prev AS (
        |  SELECT count(*) AS prev_hour_events,
        |    count(CASE WHEN event_type <> 'error' THEN 1 END) AS prev_active,
        |    round(sum(value::DECIMAL(25,2))::DOUBLE / count(value) * 100) / 100 AS prev_avg_value
        |  FROM events
        |  WHERE epoch_us(ts) // 1000000 >= 1706652000 AND epoch_us(ts) // 1000000 < 1706655600),
        |today AS (
        |  SELECT count(*) AS today_events,
        |    count(DISTINCT user_id) AS today_users,
        |    max(value) AS today_max_value
        |  FROM events
        |  WHERE epoch_us(ts) // 1000000 >= 1706572800 AND epoch_us(ts) // 1000000 < 1706659200)
        |SELECT c.*, p.*, d.*,
        |  '2024-01-30 23:00' AS current_hour_label,
        |  round(current_hour_events / 60.0 * 100) / 100 AS events_per_minute,
        |  round(100.0 * active_events / current_hour_events * 10) / 10 AS active_pct,
        |  current_hour_events - prev_hour_events AS hourly_change,
        |  CASE WHEN current_hour_events * 10 > prev_hour_events * 11 THEN 'Increasing'
        |       WHEN current_hour_events * 10 < prev_hour_events * 9 THEN 'Decreasing'
        |       ELSE 'Stable' END AS traffic_trend,
        |  active_events - prev_active AS active_change,
        |  round(100.0 * current_hour_events / today_events * 10) / 10 AS hour_share_of_day,
        |  round(100.0 * fresh_events / current_hour_events * 10) / 10 AS freshness_pct,
        |  CASE WHEN round(100.0 * fresh_events / current_hour_events * 10) / 10 >= 80 THEN 'Excellent'
        |       WHEN round(100.0 * fresh_events / current_hour_events * 10) / 10 >= 60 THEN 'Good'
        |       WHEN round(100.0 * fresh_events / current_hour_events * 10) / 10 >= 40 THEN 'Fair'
        |       ELSE 'Poor' END AS system_health,
        |  CASE WHEN current_hour_events > 30 THEN 'Peak Traffic'
        |       WHEN current_hour_events > 20 THEN 'High Traffic'
        |       WHEN current_hour_events > 12 THEN 'Moderate Traffic'
        |       WHEN current_hour_events > 6 THEN 'Light Traffic'
        |       ELSE 'Minimal Traffic' END AS traffic_intensity
        |FROM cur c CROSS JOIN prev p CROSS JOIN today d""".stripMargin,

    "q54_quality_dashboard" ->
      s"""WITH ${Quality.scoreCte(DashNowEpoch)},
        |win AS (
        |  SELECT * FROM scored WHERE epoch_us(ts) // 1000000 >= 1706571000),
        |agged AS (
        |  SELECT count(*) AS total_records,
        |    round(sum((CASE WHEN epoch_us(ts) // 1000000 >= 1706643000 THEN quality_score END)::DECIMAL(25,6))::DOUBLE /
        |      count(CASE WHEN epoch_us(ts) // 1000000 >= 1706643000 THEN 1 END) * 1000000) / 1000000 AS last_4h_avg_quality,
        |    round(min(CASE WHEN epoch_us(ts) // 1000000 >= 1706643000 THEN quality_score END) * 1000000) / 1000000 AS last_4h_min_quality,
        |    count(CASE WHEN epoch_us(ts) // 1000000 >= 1706643000 AND quality_score < 0.7 THEN 1 END) AS last_4h_poor_count,
        |    count(CASE WHEN epoch_us(ts) // 1000000 >= 1706643000 THEN 1 END) AS last_4h_total,
        |    round(sum((CASE WHEN epoch_us(ts) // 1000000 >= 1706655600 AND epoch_us(ts) // 1000000 < 1706659200 THEN quality_score END)::DECIMAL(25,6))::DOUBLE /
        |      count(CASE WHEN epoch_us(ts) // 1000000 >= 1706655600 AND epoch_us(ts) // 1000000 < 1706659200 THEN 1 END) * 1000000) / 1000000 AS current_hour_avg_quality,
        |    count(CASE WHEN epoch_us(ts) // 1000000 >= 1706655600 AND epoch_us(ts) // 1000000 < 1706659200 AND quality_score >= 0.9 THEN 1 END) AS current_hour_excellent,
        |    count(CASE WHEN epoch_us(ts) // 1000000 >= 1706655600 AND epoch_us(ts) // 1000000 < 1706659200 THEN 1 END) AS current_hour_total,
        |    count(CASE WHEN user_id IS NULL THEN 1 END) AS missing_user_count,
        |    count(CASE WHEN value IS NULL OR CAST(json_extract_string(props, '$$.k') AS INTEGER) IS NULL THEN 1 END) AS missing_position_count,
        |    count(CASE WHEN props IS NULL THEN 1 END) AS missing_props_count,
        |    count(CASE WHEN value < 0 OR value > 1000 THEN 1 END) AS invalid_value_count,
        |    count(CASE WHEN event_type IS NOT NULL AND event_type NOT IN ('click','view','purchase','signup','error') THEN 1 END) AS invalid_type_count
        |  FROM win)
        |SELECT *,
        |  '2024-01-30' AS dashboard_date,
        |  round(100.0 * last_4h_poor_count / last_4h_total * 100) / 100 AS last_4h_poor_pct,
        |  round(100.0 * current_hour_excellent / current_hour_total * 100) / 100 AS current_hour_excellent_pct,
        |  round(100.0 * missing_user_count / total_records * 1000) / 1000 AS missing_user_pct,
        |  round(100.0 * missing_position_count / total_records * 1000) / 1000 AS missing_position_pct,
        |  CASE WHEN last_4h_avg_quality >= 0.9 THEN 'EXCELLENT'
        |       WHEN last_4h_avg_quality >= 0.8 THEN 'GOOD'
        |       WHEN last_4h_avg_quality >= 0.7 THEN 'FAIR'
        |       WHEN last_4h_avg_quality >= 0.6 THEN 'POOR'
        |       ELSE 'CRITICAL' END AS quality_status_flag,
        |  last_4h_poor_count * 10 > last_4h_total AS quality_alert,
        |  missing_user_count * 50 > total_records AS missing_data_alert
        |FROM agged""".stripMargin,

    "q35_dashboard_stats" ->
      """WITH top_types AS (
        |  SELECT 'top_type' AS stat, event_type AS key, count(*)::DOUBLE AS v
        |  FROM events GROUP BY event_type
        |  ORDER BY count(*) DESC, event_type LIMIT 10),
        |top_users AS (
        |  SELECT 'top_user' AS stat, user_id::VARCHAR AS key,
        |    round(sum(value::DECIMAL(18,2))::DOUBLE, 2) AS v
        |  FROM events GROUP BY user_id
        |  ORDER BY round(sum(value::DECIMAL(18,2))::DOUBLE, 2) DESC, user_id LIMIT 10),
        |hist AS (
        |  SELECT 'hist' AS stat, ((floor(value / 10) * 10)::INT)::VARCHAR AS key,
        |    count(*)::DOUBLE AS v
        |  FROM events GROUP BY 2),
        |globals AS (
        |  SELECT 'global' AS stat, 'total_events' AS key, count(*)::DOUBLE AS v FROM events
        |  UNION ALL
        |  SELECT 'global', 'n_users', count(DISTINCT user_id)::DOUBLE FROM events)
        |SELECT * FROM (
        |  SELECT * FROM top_types UNION ALL SELECT * FROM top_users
        |  UNION ALL SELECT * FROM hist UNION ALL SELECT * FROM globals)
        |ORDER BY stat, key""".stripMargin,

    "q36_imputation_values" ->
      """WITH tc AS (
        |  SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY user_id, event_type),
        |modes AS (
        |  SELECT user_id, event_type AS mode_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
        |  FROM tc),
        |means AS (
        |  SELECT user_id,
        |    round(sum(value::DECIMAL(18,2))::DOUBLE / count(value), 4) AS mean_value
        |  FROM events GROUP BY user_id)
        |SELECT m.user_id, mode_type, mean_value
        |FROM modes m JOIN means USING (user_id) WHERE rn = 1
        |ORDER BY m.user_id""".stripMargin,
  )
}
