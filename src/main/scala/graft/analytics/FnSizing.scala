package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q136: function right-sizing — the reference's Lambda optimizer
  * (`cost-optimization/lambda-optimization/lambda_optimizer.py`) as one
  * relation per function: the memory ladder (`analyze_memory_optimization`,
  * :337-408 — raise on >80% utilization, shrink toward 1.2×max-used on
  * <30%, duration heuristics when no memory data), the performance-change
  * model (:409-424, ±improvement capped at 30%/10%), the monthly-cost
  * model on the AWS price card (:60-72, :326-336), the concurrency ladder
  * (:425-467 — reserve 2×peak when throttled, 0.7×peak above 100
  * concurrent), and the cold-start triage (:468-535 — priority and
  * improvement potential by rate band).
  *
  * "Functions" are the pipeline's task families (event_type); their
  * runtime metrics are PLANTED deterministically from each family's own
  * aggregates (the q130/q134 plant rule class: memory sizes off the name
  * length, utilization/concurrency/throttles/cold-start rate off row
  * counts) since no CloudWatch exists here — a real metrics table drops in
  * for `fns` unchanged. Money rides as pico-USD BIGINTs (the request price
  * is 0.2 micro-USD — micro would truncate it to zero), every ratio is a
  * cross-multiply, every division a canonical floor on non-negative
  * operands, and both dialects render from ONE formula generator
  * ([[formulas]]), so the oracle is hash-exact.
  *
  * Scale shape: one map-side-combined aggregation to the function grain,
  * then pure projection — |functions| rows end to end. */
object FnSizing {

  /** Formula strings over a function-metrics row; `divOp` is Spark `div`
    * or DuckDB `//`. All operands non-negative by construction, so floor
    * and truncate agree. */
  def formulas(divOp: String): Map[String, String] = Map(
    // memory ladder: utilization cross-multiplies against 80% / 30%;
    // int(x·1.5)=3x div 2, int(x·1.2)=6x div 5, int(x·0.7)=7x div 10
    "recommended_memory_mb" ->
      s"""CASE
         | WHEN avg_memory_used_mb = 0 THEN
         |  CASE WHEN avg_duration_ms > 30000
         |         THEN least(10240, current_memory_mb * 2)
         |       WHEN avg_duration_ms > 10000
         |         THEN least(3008, (current_memory_mb * 3) $divOp 2)
         |       WHEN avg_duration_ms < 1000
         |         THEN greatest(128, (current_memory_mb * 7) $divOp 10)
         |       ELSE current_memory_mb END
         | WHEN avg_memory_used_mb * 10 > current_memory_mb * 8
         |   THEN least(10240, (current_memory_mb * 3) $divOp 2)
         | WHEN avg_memory_used_mb * 10 < current_memory_mb * 3
         |   THEN greatest(128, (max_memory_used_mb * 6) $divOp 5)
         | ELSE current_memory_mb END""".stripMargin,
    "memory_confidence_pct" ->
      """CASE WHEN avg_memory_used_mb = 0 THEN 30
        | WHEN avg_memory_used_mb * 10 > current_memory_mb * 8 THEN 90
        | WHEN avg_memory_used_mb * 10 < current_memory_mb * 3 THEN 80
        | ELSE 90 END""".stripMargin,
    // performance model, ×1000: +min(0.3, (ratio−1)·0.2), −min(0.1, …·0.05)
    "perf_improvement_x1000" ->
      s"""CASE WHEN recommended_memory_mb > current_memory_mb THEN
         |  least(300, ((recommended_memory_mb - current_memory_mb) * 200)
         |    $divOp current_memory_mb)
         | WHEN recommended_memory_mb < current_memory_mb THEN
         |  -least(100, ((current_memory_mb - recommended_memory_mb) * 50)
         |    $divOp recommended_memory_mb)
         | ELSE 0 END""".stripMargin,
    "projected_duration_ms" ->
      s"(avg_duration_ms * (1000 - perf_improvement_x1000)) $divOp 1000",
    // monthly invocations: weekly×4 then ×30/7 (the reference's own double
    // scaling, mirrored faithfully); floor once
    "monthly_invocations" -> s"(invocations * 120) $divOp 7",
    // concurrency ladder and its provisioned-capacity bill
    "recommended_concurrency" ->
      s"""CASE WHEN throttles > 0 THEN greatest(max_concurrent * 2, 10)
         | WHEN max_concurrent > 100 THEN (max_concurrent * 7) $divOp 10
         | ELSE 0 END""".stripMargin,
    "concurrency_cost_picousd" -> "recommended_concurrency * 4166700 * 730",
    // cold-start triage bands
    "cold_start_priority" ->
      """CASE WHEN cold_start_pct > 20 THEN 'high'
        | WHEN cold_start_pct > 10 THEN 'medium' ELSE 'low' END""".stripMargin,
    "cold_start_improvement_x1000" ->
      """CASE WHEN cold_start_pct > 20 THEN 600
        | WHEN cold_start_pct > 10 THEN 400 ELSE 200 END""".stripMargin)

  /** Monthly cost in pico-USD for a memory size: requests at 0.2 micro-USD
    * plus GB-seconds at 16.6667 micro-USD, GB-seconds floored FIRST (the
    * canonical order that keeps the product inside Long). The divisor is
    * 1024·1000 = 1024000 — (memory_mb/1024)·(duration_ms/1000), the
    * reference's `_calculate_monthly_cost` (`lambda_optimizer.py:60-72`);
    * worst-case product 10240·1e5·1e9 ≈ 1e18 still fits Long for realistic
    * metric magnitudes here (≤1e16 on this data). */
  def costFormula(memCol: String, divOp: String): String =
    s"""monthly_invocations * 200000 +
       | (($memCol * avg_duration_ms * monthly_invocations)
       |   $divOp 1024000) * 16666700""".stripMargin

  /** q136 body over (function_name, invocations, avg_duration_ms,
    * current_memory_mb, avg_memory_used_mb, max_memory_used_mb,
    * max_concurrent, throttles, cold_start_pct). */
  def rightsizeFrom(fns: DataFrame): DataFrame = {
    val f = formulas("div")
    val order = Seq("recommended_memory_mb", "memory_confidence_pct",
      "perf_improvement_x1000", "projected_duration_ms",
      "monthly_invocations", "recommended_concurrency",
      "concurrency_cost_picousd", "cold_start_priority",
      "cold_start_improvement_x1000")
    val derived = order.foldLeft(fns) { (d, c) => d.withColumn(c, expr(f(c))) }
      .withColumn("current_monthly_cost_picousd",
        expr(costFormula("current_memory_mb", "div")))
      .withColumn("projected_monthly_cost_picousd",
        expr(costFormula("recommended_memory_mb", "div")))
      .withColumn("cost_change_picousd",
        col("projected_monthly_cost_picousd") -
          col("current_monthly_cost_picousd"))
    // uniform BIGINT emission: a CASE over int literals is int32 on Spark
    // but the oracle normalizes everything to BIGINT
    val longCols = Seq("invocations", "avg_duration_ms", "current_memory_mb",
      "avg_memory_used_mb", "max_memory_used_mb", "recommended_memory_mb",
      "memory_confidence_pct", "perf_improvement_x1000",
      "projected_duration_ms", "current_monthly_cost_picousd",
      "projected_monthly_cost_picousd", "cost_change_picousd",
      "max_concurrent", "throttles", "recommended_concurrency",
      "concurrency_cost_picousd", "cold_start_pct")
    derived.select(col("function_name") +:
        longCols.map(c => col(c).cast("long").as(c)) :+
        col("cold_start_priority") :+
        col("cold_start_improvement_x1000").cast("long")
          .as("cold_start_improvement_x1000"): _*)
      .orderBy(col("function_name"))
  }

  def q136FunctionRightsizing(spark: SparkSession, dir: String): DataFrame = {
    val fns = Tables.events(spark, dir)
      .groupBy(col("event_type").as("function_name"))
      .agg(
        count(lit(1)).as("invocations"),
        expr("50 + (cast(sum(cast(value as decimal(18,2)) * 100) as bigint)" +
          " div count(1))").as("avg_duration_ms"))
      // planted runtime metrics, pure functions of the family's own stats
      .withColumn("current_memory_mb",
        expr("cast(CASE length(function_name) % 4 WHEN 0 THEN 128 WHEN 1 THEN" +
          " 256 WHEN 2 THEN 512 ELSE 1024 END as bigint)"))
      .withColumn("avg_memory_used_mb",
        expr("(current_memory_mb * (invocations % 97)) div 100"))
      .withColumn("max_memory_used_mb",
        expr("least(current_memory_mb, (avg_memory_used_mb * 13) div 10)"))
      .withColumn("max_concurrent", expr("invocations % 317"))
      .withColumn("throttles",
        expr("CASE WHEN invocations % 5 = 0 THEN invocations % 7 ELSE 0 END"))
      .withColumn("cold_start_pct", expr("invocations % 29"))
    rightsizeFrom(fns)
  }

  val oracle: Map[String, String] = {
    val f = formulas("//")
    Map("q136_function_rightsizing" ->
      s"""WITH agg AS (
         |  SELECT event_type AS function_name, count(*)::BIGINT AS invocations,
         |    50 + (sum(value::DECIMAL(18,2) * 100)::BIGINT // count(*))
         |      AS avg_duration_ms
         |  FROM events GROUP BY event_type),
         |m1 AS (SELECT *,
         |  (CASE length(function_name) % 4 WHEN 0 THEN 128 WHEN 1 THEN 256
         |    WHEN 2 THEN 512 ELSE 1024 END)::BIGINT AS current_memory_mb
         |  FROM agg),
         |m2 AS (SELECT *,
         |  (current_memory_mb * (invocations % 97)) // 100 AS avg_memory_used_mb
         |  FROM m1),
         |fns AS (SELECT *,
         |  least(current_memory_mb, (avg_memory_used_mb * 13) // 10)
         |    AS max_memory_used_mb,
         |  invocations % 317 AS max_concurrent,
         |  CASE WHEN invocations % 5 = 0 THEN invocations % 7 ELSE 0 END
         |    AS throttles,
         |  invocations % 29 AS cold_start_pct
         |  FROM m2),
         |d1 AS (SELECT *,
         |  ${f("recommended_memory_mb")} AS recommended_memory_mb,
         |  ${f("memory_confidence_pct")} AS memory_confidence_pct,
         |  ${f("monthly_invocations")} AS monthly_invocations,
         |  ${f("recommended_concurrency")} AS recommended_concurrency,
         |  ${f("cold_start_priority")} AS cold_start_priority,
         |  ${f("cold_start_improvement_x1000")} AS cold_start_improvement_x1000
         |  FROM fns),
         |d2 AS (SELECT *,
         |  ${f("perf_improvement_x1000")} AS perf_improvement_x1000,
         |  ${f("concurrency_cost_picousd")} AS concurrency_cost_picousd,
         |  ${costFormula("current_memory_mb", "//")}
         |    AS current_monthly_cost_picousd,
         |  ${costFormula("recommended_memory_mb", "//")}
         |    AS projected_monthly_cost_picousd
         |  FROM d1),
         |d3 AS (SELECT *, ${f("projected_duration_ms")} AS projected_duration_ms
         |  FROM d2)
         |SELECT function_name, invocations, avg_duration_ms,
         |  current_memory_mb, avg_memory_used_mb, max_memory_used_mb,
         |  recommended_memory_mb::BIGINT AS recommended_memory_mb,
         |  memory_confidence_pct::BIGINT AS memory_confidence_pct,
         |  perf_improvement_x1000::BIGINT AS perf_improvement_x1000,
         |  projected_duration_ms, current_monthly_cost_picousd,
         |  projected_monthly_cost_picousd,
         |  projected_monthly_cost_picousd - current_monthly_cost_picousd
         |    AS cost_change_picousd,
         |  max_concurrent, throttles,
         |  recommended_concurrency::BIGINT AS recommended_concurrency,
         |  concurrency_cost_picousd::BIGINT AS concurrency_cost_picousd,
         |  cold_start_pct, cold_start_priority,
         |  cold_start_improvement_x1000::BIGINT
         |    AS cold_start_improvement_x1000
         |FROM d3 ORDER BY function_name""".stripMargin)
  }
}
