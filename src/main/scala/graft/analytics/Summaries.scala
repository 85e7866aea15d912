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

  val oracle: Map[String, String] = Map(
    "q45_daily_via_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |  count(*) AS n,
        |  round(sum(value::DECIMAL(18,2))::DOUBLE, 2) AS sum_value,
        |  round(sum(value::DECIMAL(18,2))::DOUBLE / count(*), 4) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
  )
}
