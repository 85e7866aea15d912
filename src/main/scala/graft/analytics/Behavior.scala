package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exprs

/** Behavioral analytics over the event log: ordered multi-step funnel,
  * day-cohort retention, and the event-type transition matrix — the three
  * shapes every product/usage dashboard family is built from (the
  * reference's dashboard views (06_analytics_views.sql) aggregate the same
  * log by hour/quality; these aggregate it by user journey).
  *
  * All three are exact-integer pipelines (epoch-micro arithmetic, counts):
  * no transcendentals, so oracle parity needs only the standard
  * (micros, event_id) ordering and `dround` at the final division.
  *
  * Scale notes:
  *   - The funnel is three hash aggregations keyed on `user_id` plus
  *     per-user equi-joins that reuse the same key — at cluster scale all
  *     of it lands in one exchange's partitioning (exchange reuse), and
  *     the final summary is a 1-row fold.
  *   - Retention joins the per-(user, day) activity relation (distinct →
  *     one shuffle) against per-user first-day (same key) and aggregates
  *     by (cohort_day, offset) — bounded by days², not users.
  *   - The transition matrix windows per user (one shuffle) then
  *     aggregates 25 (from, to) pairs; the from-totals join is a broadcast
  *     of at most |event types| rows.
  */
object Behavior {

  private val us = expr("ts_ns div 1000")

  /** q86: strictly-ordered view → click → purchase funnel. A step counts
    * only if it happens strictly AFTER the user's previous step (first
    * qualifying event each): `min(view)`, then `min(click > that)`, then
    * `min(purchase > that)` — the "first touch" funnel, immune to
    * out-of-order duplicates. Emits one row: step populations, conversion
    * percentages, and mean step latencies in micros. */
  def q86Funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("user_id"),
      col("event_type"), us.as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val c = e.join(v, "user_id")
      .filter(col("event_type") === "click" && col("us") > col("v_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val p = e.join(c, "user_id")
      .filter(col("event_type") === "purchase" && col("us") > col("c_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_view"),
        count(col("c_us")).as("n_click"),
        count(col("p_us")).as("n_purchase"),
        Exprs.dround(sum(col("c_us") - col("v_us")) / count(col("c_us")), 4)
          .as("avg_click_lat_us"),
        Exprs.dround(sum(col("p_us") - col("c_us")) / count(col("p_us")), 4)
          .as("avg_purchase_lat_us"))
      .withColumn("click_pct", Exprs.pctOf(col("n_click"), col("n_view"), 2))
      .withColumn("purchase_pct",
        Exprs.pctOf(col("n_purchase"), col("n_view"), 2))
  }

  /** q87: day-cohort retention — users grouped by their first active day;
    * for each later day-offset, how many came back (the retention triangle
    * every growth dashboard renders). Day = epoch-micros div 86400e6:
    * integer arithmetic end to end. */
  def q87Retention(spark: SparkSession, dir: String): DataFrame = {
    val day = expr("ts_ns div 1000 div 86400000000").as("day")
    val act = Tables.events(spark, dir)
      .select(col("user_id"), day).distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val cells = act.join(first, "user_id")
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    val sizes = cells.filter(col("offset") === 0)
      .select(col("cohort"), col("n_active").as("cohort_size"))
    cells.join(broadcast(sizes), "cohort")
      .withColumn("retention_pct",
        Exprs.pctOf(col("n_active"), col("cohort_size"), 2))
      .select(col("cohort"), col("offset"), col("n_active"),
        col("cohort_size"), col("retention_pct"))
      .orderBy(col("cohort"), col("offset"))
  }

  /** q88: event-type transition matrix — per user, each event's successor
    * type ((micros, event_id) order); counts and row-normalized
    * probabilities per (from, to) pair. The empirical first-order Markov
    * chain of the product's usage. */
  def q88Transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(us, col("event_id"))
    val trans = Tables.events(spark, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("from_type"))
      .agg(sum(col("n")).as("from_total"))
    trans.join(broadcast(totals), "from_type")
      .withColumn("pct", Exprs.pctOf(col("n"), col("from_total"), 2))
      .select(col("from_type"), col("to_type"), col("n"), col("from_total"),
        col("pct"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** q99: event-type co-occurrence lift — for each pair of event types,
    * how many users did both, and the lift
    * P(a∧b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b): the market-basket measure
    * that separates "these behaviors travel together" (lift > 1) from
    * independence. All-integer accumulators; the single division happens
    * on BIGINT products identically in both engines.
    *
    * Scale shape: the (user, type) distinct relation is one shuffle;
    * per-type totals are |types| rows (broadcast); the pair self-join keys
    * on user_id — fan-out bounded by |types|² per user, and the pair
    * rollup is ≤ |types|² rows. */
  def q99CooccurrenceLift(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val totals = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    val users = ut.agg(countDistinct(col("user_id")).as("n_users"))
    val pairs = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(totals.select(col("event_type").as("t1"),
        col("n_t").as("n_1"))), "t1")
      .join(broadcast(totals.select(col("event_type").as("t2"),
        col("n_t").as("n_2"))), "t2")
      .crossJoin(broadcast(users))
      .withColumn("support_pct", Exprs.pctOf(col("n_both"), col("n_users"), 2))
      .withColumn("lift", Exprs.dround(
        (col("n_both") * col("n_users")) / (col("n_1") * col("n_2")), 4))
      .select(col("t1"), col("t2"), col("n_both"), col("n_1"), col("n_2"),
        col("n_users"), col("support_pct"), col("lift"))
      .orderBy(col("t1"), col("t2"))
  }

  val oracle: Map[String, String] = Map(
    "q99_cooccurrence_lift" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events),
        |totals AS (
        |  SELECT event_type, count(*) AS n_t FROM ut GROUP BY event_type),
        |users AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
        |pairs AS (
        |  SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_both
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY a.event_type, b.event_type)
        |SELECT t1, t2, n_both, x.n_t AS n_1, y.n_t AS n_2, n_users,
        |  round(100.0 * n_both / n_users * 100) / 100 AS support_pct,
        |  round((n_both * n_users) / (x.n_t * y.n_t) * 10000) / 10000 AS lift
        |FROM pairs
        |JOIN totals x ON x.event_type = t1
        |JOIN totals y ON y.event_type = t2
        |CROSS JOIN users
        |ORDER BY t1, t2""".stripMargin,

    "q86_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS v_us FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(us) AS c_us FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND us > v_us GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(us) AS p_us FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND us > c_us GROUP BY e.user_id)
        |SELECT count(*) AS n_view, count(c_us) AS n_click,
        |  count(p_us) AS n_purchase,
        |  round(sum(c_us - v_us)::BIGINT / count(c_us) * 10000) / 10000
        |    AS avg_click_lat_us,
        |  round(sum(p_us - c_us)::BIGINT / count(p_us) * 10000) / 10000
        |    AS avg_purchase_lat_us,
        |  round(100.0 * count(c_us) / count(*) * 100) / 100 AS click_pct,
        |  round(100.0 * count(p_us) / count(*) * 100) / 100 AS purchase_pct
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin,

    "q87_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |first AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY user_id),
        |cells AS (
        |  SELECT cohort, day - cohort AS "offset",
        |    count(DISTINCT user_id) AS n_active
        |  FROM act JOIN first USING (user_id) GROUP BY cohort, day - cohort),
        |sizes AS (SELECT cohort, n_active AS cohort_size FROM cells
        |          WHERE "offset" = 0)
        |SELECT cohort, "offset", n_active, cohort_size,
        |  round(100.0 * n_active / cohort_size * 100) / 100 AS retention_pct
        |FROM cells JOIN sizes USING (cohort)
        |ORDER BY cohort, "offset"""".stripMargin,

    "q88_transitions" ->
      """WITH trans AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events),
        |counted AS (
        |  SELECT from_type, to_type, count(*) AS n FROM trans
        |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
        |totals AS (SELECT from_type, sum(n)::BIGINT AS from_total
        |           FROM counted GROUP BY from_type)
        |SELECT from_type, to_type, n, from_total,
        |  round(100.0 * n / from_total * 100) / 100 AS pct
        |FROM counted JOIN totals USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
  )
}
