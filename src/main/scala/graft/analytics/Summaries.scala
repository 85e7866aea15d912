package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exprs

/** Pre-aggregated summary reuse (SURVEY.md §4 "cacheable views", reference
  * 06 views + 07:489-511 completed-day caching): the hourly rollup is
  * computed once and every coarser grain derives from it — daily from
  * hourly, not from the fact table. At 100 TB the hourly summary is ~5
  * orders of magnitude smaller than the facts, so daily/weekly/dashboard
  * queries never rescan raw data. Counts and decimal-exact sums re-aggregate
  * losslessly; avg is derived at read time from (sum, n). */
object Summaries {

  /** One row per (day, hour, event_type): the reusable base grain.
    * `withUserCounts` adds an exact per-hour distinct-user count — off by
    * default because it is the most expensive aggregate in the rollup and
    * distincts cannot merge into coarser grains anyway. */
  def hourlySummary(spark: SparkSession, dir: String,
                    withUserCounts: Boolean = false): DataFrame = {
    val base = Tables.events(spark, dir)
      .groupBy(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        hour(col("ts")).as("hr"),
        col("event_type"))
    val aggs = Seq(
      count(lit(1)).as("n"),
      // kept DECIMAL (not double) so coarser grains re-sum exactly —
      // a double here would reintroduce summation-order sensitivity
      sum(col("value").cast("decimal(18,2)")).as("sum_value")) ++
      (if (withUserCounts) Seq(countDistinct(col("user_id")).as("n_users_hour"))
       else Nil)
    base.agg(aggs.head, aggs.tail: _*)
  }

  /** Daily grain derived purely from the hourly summary (no fact rescan).
    * n_users is intentionally absent: distincts don't merge across grains —
    * the summary carries per-hour distincts, exact daily distincts need the
    * facts (or a mergeable HLL sketch column). */
  def dailyFromHourly(hourly: DataFrame): DataFrame =
    hourly.groupBy(col("day"), col("event_type"))
      .agg(
        sum(col("n")).as("n"),
        Exprs.dround(sum(col("sum_value")).cast("double"), 2).as("sum_value"),
        Exprs.dround(sum(col("sum_value")).cast("double") / sum(col("n")), 4)
          .as("avg_value"))

  /** q45: daily rollup via the hourly summary — result identical to
    * aggregating the facts directly, which is exactly what the oracle does. */
  def q45DailyViaHourly(spark: SparkSession, dir: String): DataFrame =
    dailyFromHourly(hourlySummary(spark, dir))
      .orderBy(col("day"), col("event_type"))

  /** q75: mergeable-sketch reaggregation — the missing piece the
    * [[dailyFromHourly]] doc calls out: exact distincts do not merge across
    * grains, but a DataSketches HLL column does. The hourly summary stores
    * `hll_sketch_agg(user_id)` alongside its counts; the daily grain unions
    * the stored sketches (`hll_union_agg`) and estimates — so per-day (and
    * per-week, per-month…) distinct users come from the summary table, not
    * a fact rescan. At 100 TB this turns the most expensive dashboard
    * aggregate (daily uniques) into a scan of a few thousand summary rows,
    * and the same sketch column supports incremental maintenance: a new
    * hour's sketch just unions in.
    *
    * Sketch bytes are engine/seed-specific → rows-only for the driver;
    * SummariesSpec asserts the estimate lands within 5% of the exact
    * per-day distinct count. */
  def q75SketchReagg(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        hour(col("ts")).as("hr"))
      .agg(
        count(lit(1)).as("n"),
        hll_sketch_agg(col("user_id")).as("user_sk"))
    hourly.groupBy(col("day")).agg(
        count(lit(1)).as("n_hours"),
        sum(col("n")).as("n_events"),
        hll_sketch_estimate(hll_union_agg(col("user_sk"))).as("est_users"))
      .orderBy(col("day"))
  }

  /** q107: exact heavy hitters with bounded-memory candidate generation —
    * the frequent-items companion to q75's HLL (both are mergeable one-pass
    * sketches; reference 07:163-164's histogram family taken to the
    * high-cardinality regime).
    *
    * Pass 1 runs [[graft.functions.MisraGriesAgg]] (k = 20) over a
    * deliberately skewed key (the q101 pattern: 60% of rows collapse onto
    * three hot keys, the rest stay per-user unique): partial state is 19
    * counters per partition, merged driver-side — no per-key shuffle ever
    * happens, which is what a naive GROUP BY over billions of distinct
    * keys cannot avoid. Pass 2 recounts ONLY the ≤ 19 candidates exactly
    * (broadcast isin filter → tiny aggregate) and keeps those with
    * n_exact · k > total (integer cross-multiply, no doubles).
    *
    * Deterministic despite the sketch: MG's candidate set is a SUPERSET of
    * every key above total/k (see MisraGriesAgg scaladoc), and the exact
    * filter is symmetric on both engines — so the oracle is the plain
    * GROUP BY ... HAVING, assuming nothing about the sketch. */
  def q107HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 20
    val key = when(col("user_id") % 100 < 60,
        concat(lit("hot_"), (col("user_id") % 3).cast("string")))
      .otherwise(concat(lit("u_"), col("user_id").cast("string")))
    val e = Tables.events(spark, dir).select(key.as("k"))
    val (candidates, total) =
      e.as[String].select(graft.functions.MisraGriesAgg(k).toColumn).head()
    val hot = candidates.keys.toSeq.sorted
    e.filter(col("k").isin(hot: _*))
      .groupBy(col("k")).agg(count(lit(1)).as("n_exact"))
      .filter(col("n_exact") * k > lit(total))
      .withColumn("total", lit(total))
      .orderBy(col("n_exact").desc, col("k"))
  }

  /** q126: the analyzer's summary report (`flight_data_analyzer.py
    * :118-196` calculate_statistics) at engine scope — one long-format
    * relation (section, metric, value_num) holding the whole nested stats
    * dict: record counts and coverage, the category top-10
    * (flights_by_country → event_type), distribution statistics
    * (mean/median/min/max/std — the altitude_stats shape), dyadic
    * distribution bands, the top-10-by-magnitude records
    * (top_10_fastest_aircraft → props.k as the velocity analog),
    * geographic coverage ranges over the synthetic lat/lon mapping, and
    * the data-timestamp bounds. Runs over the planted-corruption corpus
    * (q123/q125's dirty relation) so the analyzer's dropna/notna coverage
    * semantics are actually exercised.
    *
    * Numerics: counts are exact; mean/std ride decimal-exact sums with the
    * identical-op-order variance formula (q41); the median is the exact
    * order-statistics pass shared with q97 ([[graft.quality.BatchChecks
    * .valuePctRelation]]); lon bounds compute k·3.6−180 with `3.6::DOUBLE`
    * in the oracle (the q52 lesson) and round half-up via floor.
    *
    * Scale shape: ONE global aggregation pass over the corpus (plus the
    * bounded-grid median pass), a 6-row category rollup, and a top-10 via
    * TakeOrderedAndProject — no windows over the fact table, no joins
    * beyond 1-row combines. */
  def q126AnalyzerSummary(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.quality.Quarantine
      .plantCorruption(Tables.events(spark, dir))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
    val g = base.agg(
        count(lit(1)).as("n_total"),
        count(col("value")).as("n_value"),
        count(col("user_id")).as("n_user"),
        count(when(col("value").isNotNull && col("k").isNotNull, 1))
          .as("n_pos"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        Exprs.sumExact(col("value"), 2).as("v_sum"),
        Exprs.sumExact(col("value") * col("value"), 4).as("v_sum2"),
        min(col("value")).as("v_min"), max(col("value")).as("v_max"),
        count(when(col("value") <= 128, 1)).as("b_low"),
        count(when(col("value") > 128 && col("value") <= 256, 1)).as("b_mid"),
        count(when(col("value") > 256 && col("value") <= 384, 1)).as("b_high"),
        count(when(col("value") > 384, 1)).as("b_vhigh"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"),
        min(expr("ts_ns div 1000")).as("ts_min_us"),
        max(expr("ts_ns div 1000")).as("ts_max_us"))
      .crossJoin(graft.quality.BatchChecks.valuePctRelation(base))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    // half-up 2dp via floor — sign-safe and engine-identical (q108 rule)
    def hup2(c: org.apache.spark.sql.Column) =
      floor(c * 100 + lit(0.5)) / 100
    val lonOf = (kc: org.apache.spark.sql.Column) =>
      hup2(d(kc) * lit(3.6) - 180)
    val mean = Exprs.dround(col("v_sum") / col("n_value"), 4)
    val std = Exprs.dround(sqrt(greatest(
      (col("v_sum2") - col("v_sum") * col("v_sum") / col("n_value")) /
        (col("n_value") - 1), lit(0.0))), 4)
    val entries = Seq[(String, String, org.apache.spark.sql.Column)](
      ("counts", "total", d(col("n_total"))),
      ("counts", "with_value", d(col("n_value"))),
      ("counts", "with_user", d(col("n_user"))),
      ("counts", "with_position", d(col("n_pos"))),
      ("counts", "distinct_users", d(col("n_users"))),
      ("counts", "distinct_types", d(col("n_types"))),
      ("value_stats", "mean", mean),
      ("value_stats", "median", col("p50_value")),
      ("value_stats", "min", col("v_min")),
      ("value_stats", "max", col("v_max")),
      ("value_stats", "stddev", std),
      ("value_bands", "le_128", d(col("b_low"))),
      ("value_bands", "128_256", d(col("b_mid"))),
      ("value_bands", "256_384", d(col("b_high"))),
      ("value_bands", "gt_384", d(col("b_vhigh"))),
      ("geo", "lat_min", col("v_min") - 50),
      ("geo", "lat_max", col("v_max") - 50),
      ("geo", "lon_min", lonOf(col("k_min"))),
      ("geo", "lon_max", lonOf(col("k_max"))),
      ("meta", "ts_min_us", d(col("ts_min_us"))),
      ("meta", "ts_max_us", d(col("ts_max_us"))))
    val scalarRows = g.select(explode(array(entries.map { case (s, m, c) =>
        struct(lit(s).as("section"), lit(m).as("metric"),
          c.as("value_num"))
      }: _*)).as("e"))
      .select(col("e.section"), col("e.metric"), col("e.value_num"))
    val topTypes = base.filter(col("event_type").isNotNull)
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("event_type"))))
      .filter(col("rn") <= 10)
      .select(lit("top_types").as("section"),
        col("event_type").as("metric"), d(col("cnt")).as("value_num"))
    val topK = base.filter(col("k").isNotNull)
      .orderBy(col("k").desc, col("event_id")).limit(10)
      .select(lit("top_k").as("section"),
        col("event_id").cast("string").as("metric"),
        d(col("k")).as("value_num"))
    scalarRows.unionByName(topTypes).unionByName(topK)
      .orderBy(col("section"), col("metric"))
  }

  val oracle: Map[String, String] = Map(
    "q126_analyzer_summary" -> {
      val scalarSelects = Seq(
        ("counts", "total", "n_total::DOUBLE"),
        ("counts", "with_value", "n_value::DOUBLE"),
        ("counts", "with_user", "n_user::DOUBLE"),
        ("counts", "with_position", "n_pos::DOUBLE"),
        ("counts", "distinct_users", "n_users::DOUBLE"),
        ("counts", "distinct_types", "n_types::DOUBLE"),
        ("value_stats", "mean",
          "round(v_sum / n_value * 10000) / 10000"),
        ("value_stats", "median", "p50_value"),
        ("value_stats", "min", "v_min"),
        ("value_stats", "max", "v_max"),
        ("value_stats", "stddev",
          "round(sqrt(greatest((v_sum2 - v_sum * v_sum / n_value) / " +
            "(n_value - 1), 0.0)) * 10000) / 10000"),
        ("value_bands", "le_128", "b_low::DOUBLE"),
        ("value_bands", "128_256", "b_mid::DOUBLE"),
        ("value_bands", "256_384", "b_high::DOUBLE"),
        ("value_bands", "gt_384", "b_vhigh::DOUBLE"),
        ("geo", "lat_min", "v_min - 50"),
        ("geo", "lat_max", "v_max - 50"),
        ("geo", "lon_min",
          "floor((k_min::DOUBLE * 3.6::DOUBLE - 180) * 100 + 0.5) / 100"),
        ("geo", "lon_max",
          "floor((k_max::DOUBLE * 3.6::DOUBLE - 180) * 100 + 0.5) / 100"),
        ("meta", "ts_min_us", "ts_min_us::DOUBLE"),
        ("meta", "ts_max_us", "ts_max_us::DOUBLE"))
        .map { case (s, m, v) =>
          s"SELECT '$s' AS section, '$m' AS metric, $v AS value_num" +
            " FROM g, pct"
        }.mkString("\n UNION ALL\n")
      s"""WITH dirty AS (
        |  SELECT * REPLACE (
        |    CASE WHEN event_id % 17 = 0 THEN NULL ELSE value END AS value,
        |    CASE WHEN event_id % 34 = 0 THEN NULL ELSE user_id END AS user_id,
        |    CASE WHEN event_id % 51 = 0 THEN 'bogus' ELSE event_type END
        |      AS event_type,
        |    CASE WHEN event_id % 68 = 0 THEN NULL ELSE props END AS props)
        |  FROM events),
        |base AS (
        |  SELECT event_id, user_id, event_type, value, props,
        |    CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k,
        |    epoch_us(ts) AS ts_us
        |  FROM dirty),
        |${graft.quality.BatchChecks.valuePctCtes(from = "base")},
        |g AS (SELECT
        |  count(*) AS n_total, count(value) AS n_value,
        |  count(user_id) AS n_user,
        |  count(CASE WHEN value IS NOT NULL AND k IS NOT NULL THEN 1 END)
        |    AS n_pos,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT event_type) AS n_types,
        |  sum(value::DECIMAL(25,2))::DOUBLE AS v_sum,
        |  sum((value * value)::DECIMAL(25,4))::DOUBLE AS v_sum2,
        |  min(value) AS v_min, max(value) AS v_max,
        |  count(CASE WHEN value <= 128 THEN 1 END) AS b_low,
        |  count(CASE WHEN value > 128 AND value <= 256 THEN 1 END) AS b_mid,
        |  count(CASE WHEN value > 256 AND value <= 384 THEN 1 END) AS b_high,
        |  count(CASE WHEN value > 384 THEN 1 END) AS b_vhigh,
        |  min(k) AS k_min, max(k) AS k_max,
        |  min(ts_us) AS ts_min_us, max(ts_us) AS ts_max_us
        |  FROM base),
        |scalars AS (
        |$scalarSelects),
        |types AS (
        |  SELECT 'top_types' AS section, event_type AS metric,
        |    count(*)::DOUBLE AS value_num
        |  FROM base WHERE event_type IS NOT NULL GROUP BY event_type
        |  QUALIFY row_number() OVER (ORDER BY count(*) DESC, event_type)
        |    <= 10),
        |topk AS (
        |  SELECT 'top_k' AS section, event_id::VARCHAR AS metric,
        |    k::DOUBLE AS value_num
        |  FROM base WHERE k IS NOT NULL
        |  ORDER BY k DESC, event_id LIMIT 10)
        |SELECT * FROM scalars
        |UNION ALL SELECT * FROM types
        |UNION ALL SELECT * FROM topk
        |ORDER BY section, metric""".stripMargin
    },

    "q107_heavy_hitters" ->
      """WITH keyed AS (
        |  SELECT CASE WHEN user_id % 100 < 60 THEN 'hot_' || (user_id % 3)
        |         ELSE 'u_' || user_id END AS k
        |  FROM events),
        |tot AS (SELECT count(*) AS total FROM keyed),
        |agged AS (SELECT k, count(*) AS n_exact FROM keyed GROUP BY k)
        |SELECT k, n_exact, total
        |FROM agged CROSS JOIN tot
        |WHERE n_exact * 20 > total
        |ORDER BY n_exact DESC, k""".stripMargin,

    "q45_daily_via_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |  count(*) AS n,
        |  round(sum(value::DECIMAL(18,2))::DOUBLE, 2) AS sum_value,
        |  round(sum(value::DECIMAL(18,2))::DOUBLE / count(*), 4) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
  )
}
