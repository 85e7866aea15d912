package graft.ts

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exprs

/** Per-key ordered time-series operators (SURVEY.md §2.5 W8-W11, §2.7 dedup).
  *
  * The reference runs these per-aircraft (`sort by ['icao24','timestamp']`,
  * reference `src/lambda/etl/data_transformer.py:279`); here the key is
  * `events.user_id` ordered by `ts`. All windows are PARTITIONed by the key —
  * the shuffle is one hash-partition by user_id, reused across every window
  * in the same stage, and scales linearly with key cardinality (no global
  * windows on the fact table).
  *
  * Nulls for the gap-filling ops are injected deterministically
  * (`event_type = 'view'` rows are masked), mirroring the reference's
  * missing-position semantics, so the DuckDB oracle can reproduce them.
  */
object TimeSeries {

  private def tsUs: Column = expr("ts_ns div 1000")

  /** Per-key ordered window. Ordering is (micros, event_id) — micros because
    * that is the resolution the DuckDB oracle sees, event_id as tiebreak — so
    * both engines order identically even on equal timestamps. */
  private def keyWin = Window.partitionBy(col("user_id"))
    .orderBy(expr("ts_ns div 1000"), col("event_id"))

  /** Masked measurement: the reference's nullable position/altitude analog. */
  private def masked: Column =
    when(col("event_type") =!= "view", col("value"))

  // ── Public reusable per-key operators (call these on your own data) ──

  /** §2.7 dedup strategies (reference data_transformer.py:109-126,612-659):
    * keep exactly one row per key, chosen by `order` — ascending order is
    * keep-first, a desc timestamp is keep-last, a desc quality score is
    * keep-best. One shuffle on the key columns. */
  def dedupKeep(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Forward-fill `valueCol` within each key, ordered by `ord` (pure
    * Column — apply it to the frame the key/ord/value columns resolve in). */
  def forwardFill(key: Seq[Column], ord: Seq[Column],
                  valueCol: Column): Column = {
    val w = Window.partitionBy(key: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last(valueCol, ignoreNulls = true).over(w)
  }

  /** Backward-fill `valueCol` within each key, ordered by `ord`. */
  def backwardFill(key: Seq[Column], ord: Seq[Column],
                   valueCol: Column): Column = {
    val w = Window.partitionBy(key: _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    first(valueCol, ignoreNulls = true).over(w)
  }

  /** Per-key linear interpolation of nulls in `v` against numeric time `t`
    * (pandas `interpolate(limit_direction='both')` semantics): interior nulls
    * get a time-weighted blend of the surrounding anchors, edge nulls take
    * the nearest anchor. Pure window expressions — no UDF, stays codegen'd. */
  def interpolateLinear(key: Seq[Column], ord: Seq[Column],
                        t: Column, v: Column): Column = {
    val base = Window.partitionBy(key: _*).orderBy(ord: _*)
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pv = last(v, ignoreNulls = true).over(wb)
    val pt = last(when(v.isNotNull, t), ignoreNulls = true).over(wb)
    val nv = first(v, ignoreNulls = true).over(wf)
    val nt = first(when(v.isNotNull, t), ignoreNulls = true).over(wf)
    when(v.isNotNull, v)
      .when(pv.isNull, nv)
      .when(nv.isNull, pv)
      .otherwise(pv + (nv - pv) * ((t - pt) / (nt - pt)))
  }

  /** §2.7 dedup `best_quality`-keep: one row per (user_id, hour), keeping
    * max value with event_id tiebreak (reference data_transformer.py:612-659),
    * then a per-user rollup to keep the verify output compact. */
  def q16DedupBest(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val hourKey = date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
    val w = Window.partitionBy(col("user_id"), hourKey)
      .orderBy(col("value").desc, col("event_id"))
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("n_kept"),
        Exprs.dround(Exprs.sumExact2(col("value")), 2).as("sum_value"))
      .orderBy(col("user_id"))
  }

  /** W9 forward-fill: `last(ignoreNulls)` over an unbounded-preceding frame
    * per key (reference data_transformer.py:331-335). */
  def q17ForwardFill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.withColumn("vm", masked)
      .withColumn("filled", forwardFill(
        Seq(col("user_id")), Seq(expr("ts_ns div 1000"), col("event_id")), col("vm")))
      .groupBy(col("user_id")).agg(
        count(when(col("vm").isNull, 1)).as("n_masked"),
        count(when(col("vm").isNull && col("filled").isNotNull, 1)).as("n_filled"),
        Exprs.dround(Exprs.sumExact2(col("filled")), 2).as("sum_filled"))
      .orderBy(col("user_id"))
  }

  /** W8 per-key linear interpolation, pandas `limit_direction='both'`
    * semantics (reference data_transformer.py:324-329): interior gaps get
    * time-weighted linear blend between the previous and next anchors;
    * leading/trailing gaps take the nearest anchor. Composed entirely from
    * built-in window expressions — stays in whole-stage codegen. */
  def q18Interpolate(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val interp = interpolateLinear(
      Seq(col("user_id")), Seq(expr("ts_ns div 1000"), col("event_id")),
      col("t_us"), col("vm"))
    e.withColumn("t_us", tsUs)
      .withColumn("vm", masked)
      .withColumn("vi", Exprs.dround(interp, 4))
      .groupBy(col("user_id")).agg(
        count(when(col("vm").isNull, 1)).as("n_interpolated"),
        Exprs.dround(Exprs.sumExact(col("vi"), 4), 2).as("sum_interp"))
      .orderBy(col("user_id"))
  }

  /** W11 per-key rates: Δvalue/Δt via LAG (reference
    * data_transformer.py:474-521, climb rate / acceleration). Per-row rates
    * are rounded before the exact-decimal aggregation so the per-user average
    * is summation-order independent. */
  def q19Rates(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val dv = col("value") - lag(col("value"), 1).over(keyWin)
    val dtS = (col("t_us") - lag(col("t_us"), 1).over(keyWin)) / lit(1000000.0)
    val rate = when(dtS > 0, dv / dtS)
    e.withColumn("t_us", tsUs)
      .withColumn("rate", Exprs.dround(rate, 4))
      .groupBy(col("user_id")).agg(
        count(col("rate")).as("n_rates"),
        Exprs.dround(Exprs.sumExact(abs(col("rate")), 4) / count(col("rate")), 4)
          .as("avg_abs_rate"),
        Exprs.dround(max(col("rate")), 4).as("max_rate"))
      .orderBy(col("user_id"))
  }

  /** W10 consecutive-point haversine + per-key cumulative distance (reference
    * data_transformer.py:409-472). Synthetic coordinates are derived
    * deterministically from value / props.k so the oracle can reproduce them:
    * lat = value - 50 ∈ [-50, 50], lon = 3.6 * k - 180 ∈ [-180, 176.4]. */
  def q20CumDistance(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val step = Exprs.haversineKm(
      lag(col("lat"), 1).over(keyWin), lag(col("lon"), 1).over(keyWin),
      col("lat"), col("lon"))
    Tables.withSyntheticPositions(e)
      .withColumn("step_km", Exprs.dround(step, 6))
      .groupBy(col("user_id")).agg(
        count(col("step_km")).as("n_legs"),
        Exprs.dround(Exprs.sumExact(col("step_km"), 6), 4).as("total_km"),
        Exprs.dround(max(col("step_km")), 6).as("max_leg_km"))
      .orderBy(col("user_id"))
  }

  /** q42: gap-based sessionization — a new session starts when the gap to
    * the previous event of the same user exceeds 30 minutes; session id is
    * the running count of session starts (the lag-gap + cumulative-sum
    * idiom: two windows over ONE hash partition by user). Output: per-user
    * session stats. */
  def q42Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val gapUs = 30L * 60 * 1000000 // 30 min in micros
    val prevT = lag(expr("ts_ns div 1000"), 1).over(keyWin)
    val isStart = when(prevT.isNull || (expr("ts_ns div 1000") - prevT) > gapUs, 1)
      .otherwise(0)
    val cum = keyWin.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = e
      .withColumn("session_id", sum(isStart).over(cum))
      .groupBy(col("user_id"), col("session_id")).agg(
        count(lit(1)).as("n_events"),
        // integer-floor division on both engines (Spark div, DuckDB //)
        expr("(max(ts_ns div 1000) - min(ts_ns div 1000)) div 1000000")
          .as("duration_s"))
    sessions.groupBy(col("user_id")).agg(
        count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        Exprs.dround(avg(col("n_events")), 4).as("avg_session_events"),
        max(col("duration_s")).as("max_session_s"))
      .orderBy(col("user_id"))
  }

  /** Generic as-of join: attach to every left row the LATEST right row with
    * `rightTime <= leftTime` for the same key — the time-series join Spark
    * has no operator for (builder brief §custom operators; DuckDB/kdb have
    * it natively, and DuckDB's `ASOF JOIN` is exactly the oracle).
    *
    * Implementation is the union + running-last idiom, NOT a range join:
    * tag both sides, union, and take `last(right_payload, ignoreNulls)`
    * over (key, time, side) with side ordering right-before-left so a right
    * row at the exact left timestamp qualifies (ASOF's `>=`). ONE shuffle
    * on the key, state O(1) per row — a range join would explode to
    * |left|×|matching right| intermediates and then re-aggregate them away.
    *
    * Right rows must be unique per (key, time) — dedupe first (see q58) —
    * otherwise "the" latest row at a timestamp is not well-defined in any
    * engine. Left columns pass through; each `valueCols` c returns as
    * `asof_c` (null when no right row precedes). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               timeCol: String, valueCols: Seq[String]): DataFrame = {
    val rv = struct(valueCols.map(col): _*)
    val rvType = right.select(rv.as("__rv")).schema("__rv").dataType
    val r2 = right.select(keys.map(col) :+ col(timeCol) :+ rv.as("__rv"): _*)
      .withColumn("__side", lit(0))
    val l2 = left
      .withColumn("__rv", lit(null).cast(rvType))
      .withColumn("__side", lit(1))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__last_rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        valueCols.map(c => col("__last_rv").getField(c).as(s"asof_$c")): _*)
  }

  /** q58: as-of join on events — every purchase gets the user's most recent
    * click at-or-before it (the "state at decision time" join every
    * feature/training pipeline needs). Clicks are deduped to one per
    * (user, timestamp) first so the latest row is well-defined; the DuckDB
    * oracle is a native ASOF LEFT JOIN over the identical inputs. */
  def q58AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = dedupKeep(
      e.filter(col("event_type") === "click")
        .select(col("user_id"), tsUs.as("t_us"), col("event_id"), col("value")),
      keys = Seq(col("user_id"), col("t_us")),
      order = Seq(col("event_id").desc))
      .select(col("user_id"), col("t_us"),
        col("t_us").as("click_t_us"), col("value").as("click_value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), tsUs.as("t_us"),
        col("value").as("purchase_value"))
    asofJoin(purchases, clicks, keys = Seq("user_id"), timeCol = "t_us",
        valueCols = Seq("click_t_us", "click_value"))
      .withColumn("gap_us", col("t_us") - col("asof_click_t_us"))
      .withColumn("value_delta",
        Exprs.dround(col("purchase_value") - col("asof_click_value"), 2))
      .select(col("event_id"), col("user_id"), col("purchase_value"),
        col("asof_click_value").as("click_value"), col("gap_us"),
        col("value_delta"))
      .orderBy(col("event_id"))
  }

  /** Bucketed interval join: points × intervals with NO equi key — the
    * shape Spark plans as BroadcastNestedLoopJoin (O(|points|·|intervals|)
    * comparisons) when written as a bare range predicate. Each interval is
    * exploded into the fixed-width buckets it covers and each point carries
    * its single bucket, so the range predicate rides a hash equi-join on
    * the bucket id and only refines within-bucket candidates. A point meets
    * an interval in exactly one bucket (its own), so no post-join dedup is
    * needed. Replication factor is interval_length/bucketWidth + 1 — size
    * `bucketWidth` to the typical interval length. */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
                        pointTime: String, startCol: String, endCol: String,
                        bucketWidth: Long): DataFrame = {
    val iv = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$startCol div $bucketWidth"),
        expr(s"$endCol div $bucketWidth"))))
    points.withColumn("__bucket", expr(s"$pointTime div $bucketWidth"))
      .join(iv, Seq("__bucket"))
      .filter(col(pointTime).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }

  /** q63: incident-window exclusion join — the training-data hygiene step
    * "which records were collected during an operational incident": the top-5
    * error-burst hours become padded time windows (no key!), and purchases
    * are matched point-in-interval via [[bucketedRangeJoin]]. LEFT semantics
    * keep zero-purchase incidents visible. The oracle states the naive
    * BETWEEN join (fine for DuckDB's 5-row nested loop); the Spark plan is
    * the bucketed equi-join — the plan spec forbids the nested-loop shape. */
  def q63RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val incidents = e.filter(col("event_type") === "error")
      .groupBy(expr("ts_ns div 1000 div 3600000000").as("incident_hr"))
      .agg(count(lit(1)).as("n_errors"),
        (min(tsUs) - 300000000L).as("w_start"),
        (max(tsUs) + 300000000L).as("w_end"))
      .orderBy(col("n_errors").desc, col("incident_hr")).limit(5)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"), tsUs.as("t_us"))
    val matched = bucketedRangeJoin(purchases, incidents,
        "t_us", "w_start", "w_end", bucketWidth = 900000000L)
      .groupBy(col("incident_hr")).agg(
        count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"),
        Exprs.dround(Exprs.sumExact2(col("value")) / count(col("value")), 2)
          .as("avg_purchase"))
    incidents.join(matched, Seq("incident_hr"), "left")
      .select(col("incident_hr"), col("n_errors"),
        expr("(w_end - w_start) div 1000000").as("window_s"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        coalesce(col("n_users"), lit(0L)).as("n_users"),
        coalesce(col("avg_purchase"), lit(0.0)).as("avg_purchase"))
      .orderBy(col("incident_hr"))
  }

  /** q70 (§2.5): value-based window frames — RANGE BETWEEN over event-time
    * micros (every other window here is ROWS-based; RANGE is a distinct
    * frame evaluator that includes ORDER-BY peers and needs no row
    * adjacency): per user, the trailing-1-hour event count and exact-decimal
    * value sum, rolled up to each user's peak hour-window. */
  def q70RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"))
      .rangeBetween(-3600000000L, 0)
    e.withColumn("t_us", tsUs)
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h",
        Exprs.dround(sum(col("value").cast("decimal(25,2)")).over(w)
          .cast("double"), 2))
      .groupBy(col("user_id")).agg(
        max(col("n_1h")).as("peak_1h_events"),
        Exprs.dround(max(col("sum_1h")), 2).as("peak_1h_value"))
      .orderBy(col("user_id"))
  }

  val oracle: Map[String, String] = Map(
    "q70_range_frame" ->
      """WITH t AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, value FROM events),
        |framed AS (
        |  SELECT user_id,
        |    count(*) OVER w AS n_1h,
        |    round(sum(value::DECIMAL(25,2)) OVER w ::DOUBLE * 100) / 100 AS sum_1h
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY t_us
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
        |SELECT user_id, max(n_1h) AS peak_1h_events,
        |  round(max(sum_1h) * 100) / 100 AS peak_1h_value
        |FROM framed GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q63_range_join" ->
      """WITH incidents AS (
        |  SELECT epoch_us(ts) // 3600000000 AS incident_hr,
        |    count(*) AS n_errors,
        |    min(epoch_us(ts)) - 300000000 AS w_start,
        |    max(epoch_us(ts)) + 300000000 AS w_end
        |  FROM events WHERE event_type = 'error'
        |  GROUP BY 1 ORDER BY n_errors DESC, incident_hr LIMIT 5),
        |purchases AS (
        |  SELECT event_id, user_id, value, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'purchase'),
        |matched AS (
        |  SELECT incident_hr, count(*) AS n_purchases,
        |    count(DISTINCT user_id) AS n_users,
        |    round(sum(value::DECIMAL(25,2))::DOUBLE / count(value) * 100) / 100 AS avg_purchase
        |  FROM purchases p JOIN incidents i ON p.t_us BETWEEN i.w_start AND i.w_end
        |  GROUP BY incident_hr)
        |SELECT i.incident_hr, i.n_errors,
        |  (i.w_end - i.w_start) // 1000000 AS window_s,
        |  coalesce(m.n_purchases, 0) AS n_purchases,
        |  coalesce(m.n_users, 0) AS n_users,
        |  coalesce(m.avg_purchase, 0.0) AS avg_purchase
        |FROM incidents i LEFT JOIN matched m USING (incident_hr)
        |ORDER BY i.incident_hr""".stripMargin,

    "q58_asof_join" ->
      """WITH clicks0 AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, epoch_us(ts)
        |                       ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |clicks AS (
        |  SELECT user_id, t_us, value AS click_value FROM clicks0 WHERE rn = 1),
        |purchases AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS t_us, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.purchase_value,
        |  c.click_value,
        |  p.t_us - c.t_us AS gap_us,
        |  round((p.purchase_value - c.click_value) * 100) / 100 AS value_delta
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.t_us >= c.t_us
        |ORDER BY p.event_id""".stripMargin,

    "q42_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events),
        |marked AS (
        |  SELECT user_id, t_us, event_id,
        |    CASE WHEN lag(t_us, 1) OVER w IS NULL
        |           OR t_us - lag(t_us, 1) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_start
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |sessioned AS (
        |  SELECT user_id, t_us,
        |    sum(is_start) OVER (PARTITION BY user_id ORDER BY t_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked),
        |sessions AS (
        |  SELECT user_id, session_id, count(*) AS n_events,
        |    (max(t_us) - min(t_us)) // 1000000 AS duration_s
        |  FROM sessioned GROUP BY user_id, session_id)
        |SELECT user_id, count(*) AS n_sessions,
        |  max(n_events) AS max_session_events,
        |  round(avg(n_events), 4) AS avg_session_events,
        |  max(duration_s) AS max_session_s
        |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q16_dedup_best" ->
      """WITH ranked AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |                       ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |SELECT user_id, count(*) AS n_kept,
        |  round(sum(value::DECIMAL(18,2))::DOUBLE, 2) AS sum_value
        |FROM ranked WHERE rn = 1 GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q17_forward_fill" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type <> 'view' THEN value END AS vm
        |  FROM events),
        |f AS (
        |  SELECT user_id, vm,
        |    last_value(vm IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |  FROM m)
        |SELECT user_id,
        |  count(CASE WHEN vm IS NULL THEN 1 END) AS n_masked,
        |  count(CASE WHEN vm IS NULL AND filled IS NOT NULL THEN 1 END) AS n_filled,
        |  round(sum(filled::DECIMAL(18,2))::DOUBLE, 2) AS sum_filled
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q18_interpolate" ->
      """WITH m AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, event_id,
        |    CASE WHEN event_type <> 'view' THEN value END AS vm
        |  FROM events),
        |a AS (
        |  SELECT user_id, t_us, vm,
        |    last_value(vm IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN vm IS NOT NULL THEN t_us END IGNORE NULLS) OVER wb AS pt,
        |    first_value(vm IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN vm IS NOT NULL THEN t_us END IGNORE NULLS) OVER wf AS nt
        |  FROM m
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY t_us, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY user_id ORDER BY t_us, event_id
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |i AS (
        |  SELECT user_id, vm,
        |    round((CASE WHEN vm IS NOT NULL THEN vm
        |                WHEN pv IS NULL THEN nv
        |                WHEN nv IS NULL THEN pv
        |                ELSE pv + (nv - pv) * ((t_us - pt) / (nt - pt))
        |           END) * 10000) / 10000 AS vi
        |  FROM a)
        |SELECT user_id,
        |  count(CASE WHEN vm IS NULL THEN 1 END) AS n_interpolated,
        |  round(sum(vi::DECIMAL(25,4))::DOUBLE, 2) AS sum_interp
        |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q19_rates" ->
      """WITH d AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, value,
        |    value - lag(value, 1) OVER w AS dv,
        |    (epoch_us(ts) - lag(epoch_us(ts), 1) OVER w) / 1000000.0 AS dt_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |r AS (
        |  SELECT user_id,
        |    round((CASE WHEN dt_s > 0 THEN dv / dt_s END) * 10000) / 10000 AS rate
        |  FROM d)
        |SELECT user_id, count(rate) AS n_rates,
        |  round(sum(abs(rate)::DECIMAL(25,4))::DOUBLE / count(rate), 4) AS avg_abs_rate,
        |  round(max(rate), 4) AS max_rate
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q20_cum_distance" ->
      """WITH pts AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, event_id,
        |    value - 50 AS lat,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) * 3.6::DOUBLE - 180 AS lon
        |  FROM events),
        |legs AS (
        |  SELECT user_id,
        |    lag(lat, 1) OVER w AS plat, lag(lon, 1) OVER w AS plon, lat, lon
        |  FROM pts
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |steps AS (
        |  SELECT user_id,
        |    round((2 * 6371.0 * asin(sqrt(
        |      pow(sin(radians(lat - plat) / 2), 2) +
        |      cos(radians(plat)) * cos(radians(lat)) *
        |      pow(sin(radians(lon - plon) / 2), 2)))) * 1000000) / 1000000 AS step_km
        |  FROM legs)
        |SELECT user_id, count(step_km) AS n_legs,
        |  round(sum(step_km::DECIMAL(25,6))::DOUBLE, 4) AS total_km,
        |  round(max(step_km), 6) AS max_leg_km
        |FROM steps GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
