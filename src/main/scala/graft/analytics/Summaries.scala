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

  val oracle: Map[String, String] = Map(
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
