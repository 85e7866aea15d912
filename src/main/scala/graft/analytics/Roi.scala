package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q135: optimization-ROI portfolio — the reference's ROI calculator
  * (`cost-optimization/roi-calculator/roi_calculator.py`) over the savings
  * the OTHER cost relations actually computed, closing the cost family into
  * a pipeline: q103 prices the spend, q133/q134 recommend cache and storage
  * optimizations with monthly savings, q135 decides which to fund.
  *
  * Per optimization (`calculate_optimization_roi`, :110-167): annual
  * savings, first-year payback, 5-year ROI vs implementation+maintenance,
  * NPV at the 8% discount rate, IRR, risk-adjusted ROI via the template's
  * confidence multiplier, then the prioritization score and tier
  * (`prioritize_optimizations`, :354-420: payback/complexity/savings
  * bonuses, Critical≥60 / High≥40 / Medium≥20 / Low).
  *
  * Exactness strategy (the [[graft.ops.Pct]] philosophy applied to a float
  * financial solver): every number is BIGINT micro-USD or a ×100 scaled
  * integer. Discounting `cf/(1.08)^y` becomes the ITERATED floor-division
  * chain `((cf·100) div 108 ·100) div 108 …` on the cash flow's magnitude
  * with the sign reapplied afterwards (truncated-division semantics,
  * because Spark's `div` truncates while DuckDB's `//` floors — they agree
  * only on non-negative operands, and a portfolio's cash flow CAN be
  * negative when maintenance exceeds savings). IRR drops Newton-Raphson
  * for an exact integer sweep: the largest whole-percent rate r in [0,200]
  * with NPV_r ≥ 0, the floor of the true IRR, NULL when even r=0 is
  * under water. Every formula string is generated ONCE and rendered into
  * both dialects ([[formulas]]), so the engines cannot drift.
  *
  * Scale shape: the portfolio is ≤(|patterns|+|buckets|) rows; the IRR
  * sweep explodes it ×201 and re-aggregates — trivially small, and at any
  * real portfolio size still bucket-grain, never fact-grain. */
object Roi {

  /** Investment templates (`roi_calculator.py:79-108`), micro-USD. The
    * cache recommendations come out of the query optimizer, the storage
    * ones out of the lifecycle optimizer. (type, impl, maint/mo, days,
    * confidence_pct). */
  val Templates: Map[String, (Long, Long, Long, Long)] = Map(
    "query_optimization" -> ((8000000000L, 300000000L, 21L, 80L)),
    "s3_lifecycle" -> ((5000000000L, 200000000L, 14L, 85L)))

  /** Formula strings over a portfolio row, rendered per dialect: `divOp`
    * is Spark's `div` or DuckDB's `//`. Every division is either on
    * provably non-negative operands or sign-split to magnitude form, so
    * floor and truncate agree. Half-up rounding (positive operands only):
    * (2a+b) div (2b). */
  def formulas(divOp: String): Map[String, String] = {
    def hup(num: String, den: String) = // half-up, non-negative operands
      s"(2 * ($num) + ($den)) $divOp (2 * ($den))"
    def signed(mag: String, signSrc: String) =
      s"(CASE WHEN ($signSrc) >= 0 THEN ($mag) ELSE -($mag) END)"
    // 5-year discount chain at 8% on the cash-flow magnitude `acf`
    def chain(d: String): String = {
      val steps = Iterator.iterate("acf")(p => s"(($p) * 100) $divOp ($d)")
        .drop(1).take(5).toSeq
      steps.mkString(" + ")
    }
    Map(
      "annual" -> "monthly_savings_microusd * 12",
      "cf" -> "annual - 12 * maint_microusd", // yearly net cash flow
      "acf" -> "abs(annual - 12 * maint_microusd)",
      "payback_months_x100" -> // first-year investment / monthly savings
        s"""CASE WHEN monthly_savings_microusd > 0
           | THEN ${hup("(impl_microusd + 12 * maint_microusd) * 100",
                        "monthly_savings_microusd")}
           | ELSE NULL END""".stripMargin,
      "total_inv" -> "impl_microusd + 60 * maint_microusd",
      "roi_num" -> "annual * 5 - (impl_microusd + 60 * maint_microusd)",
      "roi_pct_x100" -> // half-away-from-zero: sign-split half-up
        signed(hup("abs(roi_num) * 10000", "total_inv"), "roi_num"),
      "risk_adjusted_roi_x100" ->
        signed(s"(abs(roi_pct_x100) * confidence_pct) $divOp 100",
          "roi_pct_x100"),
      "npv5y_microusd" ->
        (signed(s"(${chain("108")})", "cf") + " - impl_microusd"),
      // IRR sweep row (needs column r in scope): NPV at rate r%
      "npv_at_r" ->
        (signed(s"(${chain("100 + r")})", "cf") + " - impl_microusd"),
      "payback_bonus" ->
        """CASE WHEN payback_months_x100 IS NULL THEN -20
          | WHEN payback_months_x100 < 600 THEN 20
          | WHEN payback_months_x100 < 1200 THEN 10
          | WHEN payback_months_x100 < 2400 THEN 0
          | ELSE -20 END""".stripMargin,
      "complexity_bonus" ->
        """CASE WHEN impl_days < 7 THEN 10 WHEN impl_days < 14 THEN 5
          | WHEN impl_days < 30 THEN 0 ELSE -10 END""".stripMargin,
      "savings_bonus" ->
        """CASE WHEN annual > 50000000000 THEN 15
          | WHEN annual > 20000000000 THEN 10
          | WHEN annual > 10000000000 THEN 5 ELSE 0 END""".stripMargin,
      "total_score_x100" ->
        "risk_adjusted_roi_x100 + (payback_bonus + complexity_bonus + savings_bonus) * 100",
      "priority" ->
        """CASE WHEN total_score_x100 >= 6000 THEN 'Critical'
          | WHEN total_score_x100 >= 4000 THEN 'High'
          | WHEN total_score_x100 >= 2000 THEN 'Medium'
          | ELSE 'Low' END""".stripMargin)
  }

  /** Column order of the q135 output (shared by relation and oracle). */
  val OutCols: Seq[String] = Seq("optimization_name", "opt_type",
    "monthly_savings_microusd", "annual_savings_microusd",
    "payback_months_x100", "roi_pct_x100", "risk_adjusted_roi_x100",
    "npv5y_microusd", "irr_floor_pct", "impl_days", "confidence_pct",
    "total_score_x100", "priority")

  /** q135 body. `portfolio` columns: optimization_name, opt_type,
    * monthly_savings_microusd, impl_microusd, maint_microusd, impl_days,
    * confidence_pct. */
  def roiFrom(portfolio: DataFrame): DataFrame = {
    val f = formulas("div")
    val order = Seq("annual", "cf", "acf", "payback_months_x100",
      "total_inv", "roi_num", "roi_pct_x100", "risk_adjusted_roi_x100",
      "npv5y_microusd", "payback_bonus", "complexity_bonus",
      "savings_bonus", "total_score_x100", "priority")
    val derived = order.foldLeft(portfolio) { (d, c) => d.withColumn(c, expr(f(c))) }
    // exact IRR floor: largest whole-percent rate keeping NPV non-negative
    val irr = portfolio
      .withColumn("r", explode(sequence(lit(0L), lit(200L))))
      .withColumn("annual", expr(f("annual")))
      .withColumn("cf", expr(f("cf")))
      .withColumn("acf", expr(f("acf")))
      .withColumn("npv_at_r", expr(f("npv_at_r")))
      .groupBy(col("optimization_name"))
      .agg(max(when(col("npv_at_r") >= 0, col("r"))).as("irr_floor_pct"))
    derived.join(irr, Seq("optimization_name"), "left")
      .withColumn("annual_savings_microusd", col("annual"))
      .select(OutCols.map(col): _*)
      .orderBy(col("total_score_x100").desc, col("optimization_name"))
  }

  /** The q135 driver entry: the portfolio is every candidate q133 and q134
    * surfaced on this corpus, labeled by family — INCLUDING rows below
    * their own recommendation cuts, deliberately: the ROI relation is the
    * second opinion on those cuts (a below-cut candidate with a positive
    * NPV is exactly the row worth a second look), and keeping the full
    * candidate set gives the relation stable cardinality at any SF. */
  def q135RoiPortfolio(spark: SparkSession, dir: String): DataFrame = {
    def withTemplate(df: DataFrame, prefix: String, nameCol: String,
                     tpe: String): DataFrame = {
      val (impl, maint, days, conf) = Templates(tpe)
      df.select(
        concat(lit(prefix), col(nameCol)).as("optimization_name"),
        lit(tpe).as("opt_type"),
        col("monthly_savings_microusd"),
        lit(impl).as("impl_microusd"), lit(maint).as("maint_microusd"),
        lit(days).as("impl_days"), lit(conf).as("confidence_pct"))
    }
    val cache = withTemplate(Dashboard.q133CacheRecommendations(spark, dir),
      "cache:", "query_pattern", "query_optimization")
    val storage = withTemplate(
      StorageTiers.q134StorageTierRecommendations(spark, dir),
      "storage:", "bucket", "s3_lifecycle")
    // the portfolio is bucket-grain (<=|patterns|+|buckets| rows) but its
    // lineage holds two fact scans, and roiFrom consumes it twice (derived
    // metrics + the IRR sweep) — measured 4 parquet scans without this.
    // One eager localCheckpoint materializes the tiny relation once; the
    // r6 lost-partitioning caveat is moot because both consumers
    // re-aggregate rather than join on a co-partitioned key.
    roiFrom(cache.unionByName(storage).localCheckpoint())
  }

  /** Oracle: the same formula strings rendered with `//`, over the q133 and
    * q134 oracle bodies as portfolio sources. */
  val oracle: Map[String, String] = {
    val f = formulas("//")
    val q133Body = Dashboard.oracle("q133_cache_recommendations")
    val q134Body = StorageTiers.oracle("q134_storage_tier_recommendations")
    // each source oracle embeds whole as a WITH-bearing subselect
    val portfolio =
      s"""portfolio AS (
         |  SELECT 'cache:' || query_pattern AS optimization_name,
         |    'query_optimization' AS opt_type, monthly_savings_microusd,
         |    8000000000::BIGINT AS impl_microusd,
         |    300000000::BIGINT AS maint_microusd,
         |    21::BIGINT AS impl_days, 80::BIGINT AS confidence_pct
         |  FROM (${q133Body.replace("\n", "\n    ")}) c
         |  UNION ALL
         |  SELECT 'storage:' || bucket AS optimization_name,
         |    's3_lifecycle' AS opt_type, monthly_savings_microusd,
         |    5000000000::BIGINT AS impl_microusd,
         |    200000000::BIGINT AS maint_microusd,
         |    14::BIGINT AS impl_days, 85::BIGINT AS confidence_pct
         |  FROM (${q134Body.replace("\n", "\n    ")}) s)""".stripMargin
    val sql =
      s"""WITH $portfolio,
         |d1 AS (SELECT *, ${f("annual")} AS annual FROM portfolio),
         |d2 AS (SELECT *, ${f("cf")} AS cf, ${f("acf")} AS acf,
         |  ${f("payback_months_x100")} AS payback_months_x100,
         |  ${f("total_inv")} AS total_inv, ${f("roi_num")} AS roi_num
         |  FROM d1),
         |d3 AS (SELECT *, ${f("roi_pct_x100")} AS roi_pct_x100,
         |  ${f("npv5y_microusd")} AS npv5y_microusd FROM d2),
         |d4 AS (SELECT *, ${f("risk_adjusted_roi_x100")} AS risk_adjusted_roi_x100,
         |  ${f("payback_bonus")} AS payback_bonus,
         |  ${f("complexity_bonus")} AS complexity_bonus,
         |  ${f("savings_bonus")} AS savings_bonus FROM d3),
         |d5 AS (SELECT *, ${f("total_score_x100")} AS total_score_x100 FROM d4),
         |irr AS (
         |  SELECT optimization_name,
         |    max(CASE WHEN ${f("npv_at_r")} >= 0 THEN r END) AS irr_floor_pct
         |  FROM d2, (SELECT unnest(generate_series(0, 200)) AS r) rates
         |  GROUP BY optimization_name)
         |SELECT d5.optimization_name, opt_type,
         |  monthly_savings_microusd::BIGINT AS monthly_savings_microusd,
         |  annual::BIGINT AS annual_savings_microusd,
         |  payback_months_x100::BIGINT AS payback_months_x100,
         |  roi_pct_x100::BIGINT AS roi_pct_x100,
         |  risk_adjusted_roi_x100::BIGINT AS risk_adjusted_roi_x100,
         |  npv5y_microusd::BIGINT AS npv5y_microusd,
         |  irr_floor_pct::BIGINT AS irr_floor_pct,
         |  impl_days::BIGINT AS impl_days,
         |  confidence_pct::BIGINT AS confidence_pct,
         |  total_score_x100::BIGINT AS total_score_x100,
         |  ${f("priority")} AS priority
         |FROM d5 JOIN irr ON d5.optimization_name = irr.optimization_name
         |ORDER BY total_score_x100 DESC, d5.optimization_name""".stripMargin
    Map("q135_roi_portfolio" -> sql)
  }
}
