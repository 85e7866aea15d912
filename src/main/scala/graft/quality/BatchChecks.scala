package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exprs

/** Batch-level quality checks (SURVEY.md §2.9 Q8 IQR fences, Q11 corruption,
  * Q12 the 14-check batch suite) plus the W6 peak-window shape.
  *
  * Q12's suite (reference `src/lambda/data_transformation/
  * data_quality_validator.py:80-909`) runs a file-sized batch through ratio
  * checks and emits one weighted score + grade; here the whole suite is ONE
  * aggregation pass over the batch — every check is an agg expression, so
  * cost is a single scan regardless of how many checks run. */
object BatchChecks {

  /** q39 (W6): hourly counts with the per-day peak window —
    * MAX(count) OVER (PARTITION BY day) and an is-peak flag. */
  def q39PeakHours(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val hourly = e.groupBy(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val byDay = Window.partitionBy(col("day"))
    hourly
      .withColumn("day_peak", max(col("n")).over(byDay))
      .withColumn("is_peak", col("n") === col("day_peak"))
      .orderBy(col("day"), col("hr"))
  }

  /** q40 (Q8 IQR + Q11 corruption): quartile fences (1.5×IQR) per event
    * type plus NaN/Inf/absurd-magnitude corruption counters. */
  def q40IqrOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val quartiles = e.groupBy(col("event_type")).agg(
      expr("percentile(value, 0.25)").as("q1"),
      expr("percentile(value, 0.75)").as("q3"))
    val fenced = e.join(broadcast(quartiles), "event_type")
      .withColumn("iqr", col("q3") - col("q1"))
      .withColumn("lo", col("q1") - lit(1.5) * col("iqr"))
      .withColumn("hi", col("q3") + lit(1.5) * col("iqr"))
    fenced.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        count(when(col("value") < col("lo") || col("value") > col("hi"), 1))
          .as("n_outliers"),
        count(when(isnan(col("value")), 1)).as("n_nan"),
        count(when(col("value") === Double.PositiveInfinity ||
          col("value") === Double.NegativeInfinity, 1)).as("n_inf"),
        count(when(abs(col("value")) > 1e10, 1)).as("n_absurd"),
        Exprs.dround(min(col("lo")), 4).as("fence_lo"),
        Exprs.dround(max(col("hi")), 4).as("fence_hi"))
      .orderBy(col("event_type"))
  }

  /** q41 (Q12): the batch check suite as one aggregation — completeness,
    * validity, uniqueness, accuracy-ish ratios + weighted overall + grade,
    * one output row per batch (here: per table load). */
  def q41BatchCheckSuite(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    def ratio(c: Column) = c.cast("double") / count(lit(1))
    val checks = e.agg(
      count(lit(1)).as("n_rows"),
      Exprs.dround(ratio(count(col("value"))), 6).as("completeness_value"),
      Exprs.dround(ratio(count(col("user_id"))), 6).as("completeness_user"),
      Exprs.dround(ratio(count(when(col("value").between(0, 1000), 1))), 6)
        .as("validity_range"),
      Exprs.dround(ratio(count(when(
        col("event_type").isin("click", "view", "purchase", "signup", "error"), 1))), 6)
        .as("validity_domain"),
      Exprs.dround(ratio(countDistinct(col("event_id"))), 6).as("uniqueness_id"),
      // cutoff on exact epoch nanos, not a session-timezone-parsed literal
      Exprs.dround(ratio(count(when(
        col("ts_ns") <= lit(1706745600L * 1000000000L), 1))), 6) // 2024-02-01T00Z
        .as("timestamp_sanity"))
    checks.withColumn("overall_score", Exprs.dround(
        col("completeness_value") * 0.2 + col("completeness_user") * 0.1 +
        col("validity_range") * 0.25 + col("validity_domain") * 0.15 +
        col("uniqueness_id") * 0.2 + col("timestamp_sanity") * 0.1, 6))
      .withColumn("grade", Exprs.gradeOf(col("overall_score")))
  }

  val oracle: Map[String, String] = Map(
    "q39_peak_hours" ->
      """WITH hourly AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, extract(hour FROM ts)::INT AS hr,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT day, hr, n,
        |  max(n) OVER (PARTITION BY day) AS day_peak,
        |  n = max(n) OVER (PARTITION BY day) AS is_peak
        |FROM hourly ORDER BY day, hr""".stripMargin,

    "q40_iqr_outliers" ->
      """WITH quartiles AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY event_type),
        |fenced AS (
        |  SELECT e.event_type, value,
        |    q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
        |  FROM events e JOIN quartiles q ON e.event_type = q.event_type)
        |SELECT event_type, count(*) AS n,
        |  count(CASE WHEN value < lo OR value > hi THEN 1 END) AS n_outliers,
        |  count(CASE WHEN isnan(value) THEN 1 END) AS n_nan,
        |  count(CASE WHEN isinf(value) THEN 1 END) AS n_inf,
        |  count(CASE WHEN abs(value) > 1e10 THEN 1 END) AS n_absurd,
        |  round(min(lo), 4) AS fence_lo,
        |  round(max(hi), 4) AS fence_hi
        |FROM fenced GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q41_batch_check_suite" ->
      """WITH checks AS (
        |  SELECT count(*) AS n_rows,
        |    round(count(value) / count(*), 6) AS completeness_value,
        |    round(count(user_id) / count(*), 6) AS completeness_user,
        |    round(count(CASE WHEN value BETWEEN 0 AND 1000 THEN 1 END) / count(*), 6) AS validity_range,
        |    round(count(CASE WHEN event_type IN ('click','view','purchase','signup','error') THEN 1 END) / count(*), 6) AS validity_domain,
        |    round(count(DISTINCT event_id) / count(*), 6) AS uniqueness_id,
        |    round(count(CASE WHEN epoch_us(ts) <= 1706745600000000 THEN 1 END) / count(*), 6) AS timestamp_sanity
        |  FROM events)
        |SELECT *,
        |  round(completeness_value * 0.2 + completeness_user * 0.1 +
        |        validity_range * 0.25 + validity_domain * 0.15 +
        |        uniqueness_id * 0.2 + timestamp_sanity * 0.1, 6) AS overall_score,
        |  CASE WHEN round(completeness_value * 0.2 + completeness_user * 0.1 +
        |        validity_range * 0.25 + validity_domain * 0.15 +
        |        uniqueness_id * 0.2 + timestamp_sanity * 0.1, 6) >= 0.95 THEN 'A'
        |       WHEN round(completeness_value * 0.2 + completeness_user * 0.1 +
        |        validity_range * 0.25 + validity_domain * 0.15 +
        |        uniqueness_id * 0.2 + timestamp_sanity * 0.1, 6) >= 0.85 THEN 'B'
        |       WHEN round(completeness_value * 0.2 + completeness_user * 0.1 +
        |        validity_range * 0.25 + validity_domain * 0.15 +
        |        uniqueness_id * 0.2 + timestamp_sanity * 0.1, 6) >= 0.70 THEN 'C'
        |       WHEN round(completeness_value * 0.2 + completeness_user * 0.1 +
        |        validity_range * 0.25 + validity_domain * 0.15 +
        |        uniqueness_id * 0.2 + timestamp_sanity * 0.1, 6) >= 0.50 THEN 'D'
        |       ELSE 'F' END AS grade
        |FROM checks""".stripMargin,
  )
}
