package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exprs

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

  val oracle: Map[String, String] = Map(
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
