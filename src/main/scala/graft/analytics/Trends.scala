package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Exprs, Pct}

/** Day-over-day pipeline health: distribution-drift monitoring and
  * least-squares trend fitting over the daily partition grain — the two
  * checks a scheduled ingestion pipeline runs after each partition lands
  * (the reference's per-batch quality metrics table,
  * `sql/athena/03_create_processed_tables.sql:140-191`, stores exactly
  * these per-batch aggregates; the trend/drift math itself is what its
  * CloudWatch alarms approximate).
  *
  * Scale notes:
  *   - Both operators aggregate the fact table to the (day) or
  *     (event_type, day) grain FIRST — one hash aggregation with map-side
  *     combine — and run the window/regression math on the tiny aggregate
  *     (≤ days × types rows). The day-ordered LAG window is global but
  *     windows ~30 rows, not the corpus; at 100 TB the shape is unchanged
  *     because the aggregate's size depends on the calendar, not the data.
  *   - Drift flags use cross-multiplied integer comparisons (5·n > 6·prev
  *     is +20%), never a derived-double equality — CLAUDE.md band rule.
  *   - The OLS accumulators (Σx, Σy, Σxy, Σx², Σy²) are exact integer
  *     sums; the y² chain (syy, ryy, den·ryy) is DECIMAL because daily
  *     counts near 3e9 overflow BIGINT when squared. Doubles appear only
  *     in the final slope/intercept/r divisions, computed with identical
  *     operation order in both engines and then `dround`ed.
  */
object Trends {

  private val day = expr("ts_ns div 1000 div 86400000000")

  /** q92: day-over-day drift monitor — per daily partition: volume,
    * distinct users, exact mean value, heavy-tail share; each compared to
    * the previous day with ±20% integer-banded drift flags. The "did
    * yesterday's load look like today's?" gate that guards a 100-TB
    * backfill from silently ingesting a malformed day. */
  def q92DriftMonitor(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(day.as("day"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        Exprs.avgExact2(col("value"), 4).as("avg_value"),
        count(when(col("value") > 400, 1)).as("n_hi"))
      .withColumn("hi_pct", Exprs.pctOf(col("n_hi"), col("n"), 2))
    val w = Window.orderBy(col("day"))
    daily
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("prev_users", lag(col("n_users"), 1).over(w))
      .withColumn("vol_change_pct",
        Exprs.dround(lit(100.0) * (col("n") - col("prev_n")) / col("prev_n"), 2))
      .withColumn("flag_volume", coalesce(
        lit(5) * col("n") > lit(6) * col("prev_n") ||
        lit(5) * col("n") < lit(4) * col("prev_n"), lit(false)))
      .withColumn("flag_users", coalesce(
        lit(5) * col("n_users") > lit(6) * col("prev_users") ||
        lit(5) * col("n_users") < lit(4) * col("prev_users"), lit(false)))
      .select(col("day"), col("n"), col("prev_n"), col("vol_change_pct"),
        col("n_users"), col("avg_value"), col("hi_pct"),
        col("flag_volume"), col("flag_users"))
      .orderBy(col("day"))
  }

  /** q93: per-event-type OLS trend over daily counts — slope, intercept
    * and correlation of volume vs day index (the "is this source growing,
    * shrinking, or noisy?" classifier behind capacity planning and
    * source-mix decisions). x is the day offset from the global first day
    * (1-row broadcast), so all five accumulators are exact integer sums. */
  def q93TrendSlope(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), day.as("day"))
      .agg(count(lit(1)).as("y"))
    val first = daily.agg(min(col("day")).as("day0"))
    val fit = daily.crossJoin(broadcast(first))
      .withColumn("x", col("day") - col("day0"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("y")).as("n_events"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        // y can reach ~3e9 daily events at 100 TB, so y² (and later sy²,
        // n_days·syy) overflow BIGINT; the y-side chain is decimal end to
        // end. The x side (day offsets, ≤ tens of thousands) stays BIGINT.
        sum(col("y").cast("decimal(18,0)") * col("y")).as("syy"))
      .withColumn("num", col("n_days") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", col("n_days") * col("sxx") - col("sx") * col("sx"))
      .withColumn("ryy", col("n_days") * col("syy")
        - col("sy").cast("decimal(18,0)") * col("sy"))
    fit
      .withColumn("slope", Exprs.dround(col("num") / col("den"), 6))
      .withColumn("intercept", Exprs.dround(
        (col("sy") - (col("num") / col("den")) * col("sx")) / col("n_days"), 6))
      .withColumn("r", Exprs.dround(
        col("num") / sqrt((col("den") * col("ryy")).cast("double")), 6))
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("slope"), col("intercept"), col("r"))
      .orderBy(col("event_type"))
  }

  /** q98: join-key skew diagnostic — per event type, the distribution of
    * rows across `user_id` keys: key count, max/mean ratio, exact p50/p99
    * of per-key row counts, and an integer-banded "needs salting" flag
    * (max > 4× mean). This is the report that decides between a plain
    * hash join/aggregation and the salted two-stage form
    * (`Exprs.saltedCountSum`) or AQE skew-join handling at 100 TB.
    *
    * Scale shape: (type, key) partial counts take map-side combine; the
    * per-type rollup is bounded by |types|. The skew flag cross-multiplies
    * BIGINTs (max·n_keys > 4·total) — no derived-double comparison. p50
    * rides the shared exact order-statistics pass ([[graft.ops.Pct]] —
    * engine-version robust, unlike the empirical percentile/quantile_cont
    * pairing that broke on an INTEGER column in r07); p99 is the
    * ceil(0.99·n_keys)-th smallest count — an exact integer rank over the
    * per-key aggregate, because 0.99 is non-dyadic and interpolated
    * doubles cannot be compared across engines (CLAUDE.md). The rank
    * window runs over the per-key relation (|keys| rows, already reduced
    * from the fact table), partitioned by type — same scale class as the
    * rollup itself. */
  def q98KeySkew(spark: SparkSession, dir: String): DataFrame = {
    val perKey = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    // Ties in n are irrelevant: the value at a fixed rank of the sorted
    // multiset of counts is deterministic whatever order equal counts take.
    val wRank = Window.partitionBy(col("event_type")).orderBy(col("n"))
    val wAll = Window.partitionBy(col("event_type"))
    val p99 = perKey
      .withColumn("rn", row_number().over(wRank))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .where(col("rn") === expr("(99 * cnt + 99) div 100"))
      .select(col("event_type"), col("n").as("p99_n"))
    // exact order-statistics median of the per-key counts (Pct): counts are
    // an INTEGER column, exactly the class where the driver's DuckDB build
    // diverged from the empirical percentile/quantile_cont pairing in r07
    val p50 = Pct.relation(perKey, Seq("event_type"), "n", Seq("p50" -> 0.5))
    perKey.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("n")).as("total"),
        max(col("n")).as("max_n"))
      .join(broadcast(p50), "event_type")
      .withColumn("p50_n", Exprs.dround(col("p50"), 4))
      .join(p99, Seq("event_type"))
      .withColumn("skew_factor",
        Exprs.dround(col("max_n") * col("n_keys") / col("total"), 4))
      .withColumn("needs_salting",
        col("max_n") * col("n_keys") > lit(4) * col("total"))
      .select(col("event_type"), col("n_keys"), col("total"), col("max_n"),
        col("p50_n"), col("p99_n"), col("skew_factor"), col("needs_salting"))
      .orderBy(col("event_type"))
  }

  /** q101: skew-adaptive aggregation — the CONSUMER of q98's diagnostic.
    * A deliberately skewed key (70% of rows collapse to one bucket) is
    * aggregated count+sum per key; the q98 banded rule (max·n_keys >
    * 4·total, integer cross-multiply) decides between the plain one-stage
    * hash aggregation and [[Exprs.saltedCountSum]]'s two-stage salted form
    * — stage 1 on (key, salt) spreads the hot key over 32 reducers, stage
    * 2 merges partials per key.
    *
    * The decision is a 1-row driver-evaluated aggregate (the same
    * orchestration grain as the Cdc snapshot and k-means loops — not a
    * data-sized collect). Salting is result-invariant, so the oracle is
    * the plain GROUP BY; it recomputes the banded decision in SQL, which
    * checks the wiring (was_salted=true on this data), and the sums ride
    * decimals through both stages so partial merge order can't flip a
    * rounded double (CLAUDE.md sum rule). */
  def q101SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("k",
        when(col("user_id") % 10 < 7, lit(-1L)).otherwise(col("user_id")))
    val needsSalting = e.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("total"),
        max(col("n")).as("max_n"))
      .select((col("max_n") * col("n_keys") > lit(4) * col("total"))
        .as("needs_salting"))
      .collect()(0).getBoolean(0)
    val agged =
      if (needsSalting)
        Exprs.saltedCountSum(e, col("k"), col("value").cast("decimal(18,2)"), 32)
      else
        e.groupBy(col("k").as("k")).agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("total"))
    agged
      .select(col("k"), col("n"), col("total").cast("double").as("sum_value"),
        lit(needsSalting).as("was_salted"))
      .orderBy(col("n").desc, col("k"))
      .limit(15)
  }

  val oracle: Map[String, String] = Map(
    "q101_salted_agg" ->
      """WITH keyed AS (
        |  SELECT CASE WHEN user_id % 10 < 7 THEN -1 ELSE user_id END AS k,
        |    value
        |  FROM events),
        |diag AS (
        |  SELECT max(n) * count(*) > 4 * sum(n) AS needs_salting
        |  FROM (SELECT k, count(*) AS n FROM keyed GROUP BY k)),
        |agged AS (
        |  SELECT k, count(*) AS n,
        |    sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
        |  FROM keyed GROUP BY k)
        |SELECT k, n, sum_value, needs_salting AS was_salted
        |FROM agged CROSS JOIN diag
        |ORDER BY n DESC, k LIMIT 15""".stripMargin,
    "q98_key_skew" ->
      s"""WITH per_key AS (
        |  SELECT event_type, user_id, count(*) AS n
        |  FROM events GROUP BY event_type, user_id),
        |ranked AS (
        |  SELECT event_type, n,
        |    row_number() OVER (PARTITION BY event_type ORDER BY n) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM per_key),
        |p99 AS (
        |  SELECT event_type, n AS p99_n FROM ranked
        |  WHERE rn = (99 * cnt + 99) // 100),
        |${Pct.ctes("p50c", "per_key", Seq("event_type"), "n",
            Seq("p50" -> 0.5))},
        |rolled AS (
        |  SELECT event_type, count(*) AS n_keys, sum(n)::BIGINT AS total,
        |    max(n) AS max_n
        |  FROM per_key GROUP BY event_type)
        |SELECT event_type, n_keys, total, max_n,
        |  round(p50 * 10000) / 10000 AS p50_n, p99_n,
        |  round(max_n * n_keys / total * 10000) / 10000 AS skew_factor,
        |  max_n * n_keys > 4 * total AS needs_salting
        |FROM rolled JOIN p99 USING (event_type) JOIN p50c USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "q92_drift_monitor" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS n,
        |    count(DISTINCT user_id) AS n_users,
        |    round(sum(value::DECIMAL(18,2))::DOUBLE / count(value) * 10000) / 10000
        |      AS avg_value,
        |    count(CASE WHEN value > 400 THEN 1 END) AS n_hi
        |  FROM events GROUP BY 1),
        |lagged AS (
        |  SELECT *, round(100.0 * n_hi / n * 100) / 100 AS hi_pct,
        |    lag(n) OVER (ORDER BY day) AS prev_n,
        |    lag(n_users) OVER (ORDER BY day) AS prev_users
        |  FROM daily)
        |SELECT day, n, prev_n,
        |  round(100.0 * (n - prev_n) / prev_n * 100) / 100 AS vol_change_pct,
        |  n_users, avg_value, hi_pct,
        |  coalesce(5 * n > 6 * prev_n OR 5 * n < 4 * prev_n, false)
        |    AS flag_volume,
        |  coalesce(5 * n_users > 6 * prev_users OR 5 * n_users < 4 * prev_users,
        |    false) AS flag_users
        |FROM lagged ORDER BY day""".stripMargin,

    "q93_trend_slope" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |first AS (SELECT min(day) AS day0 FROM daily),
        |fit AS (
        |  SELECT event_type,
        |    count(*) AS n_days, sum(y)::BIGINT AS n_events,
        |    sum(day - day0)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |    sum((day - day0) * y)::BIGINT AS sxy,
        |    sum((day - day0) * (day - day0))::BIGINT AS sxx,
        |    sum(y * y)::BIGINT AS syy
        |  FROM daily CROSS JOIN first GROUP BY event_type),
        |terms AS (
        |  SELECT *, n_days * sxy - sx * sy AS num,
        |    n_days * sxx - sx * sx AS den,
        |    n_days * syy - sy * sy AS ryy
        |  FROM fit)
        |SELECT event_type, n_days, n_events,
        |  round(num / den * 1000000) / 1000000 AS slope,
        |  round((sy - (num / den) * sx) / n_days * 1000000) / 1000000
        |    AS intercept,
        |  round(num / sqrt((den * ryy)::DOUBLE) * 1000000) / 1000000 AS r
        |FROM terms ORDER BY event_type""".stripMargin,
  )
}
