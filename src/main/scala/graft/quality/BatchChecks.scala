package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Exprs, Pct}

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
    // exact order-statistics quartiles (Pct): engine-version robust where
    // the percentile/quantile_cont pairing is only empirically equal
    val quartiles = Pct.relation(e, Seq("event_type"), "value",
      Seq("q1" -> 0.25, "q3" -> 0.75))
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

  /** q41 (Q12): the FULL batch check suite — all 16 checks of the reference
    * validator (`data_quality_validator.py:34-52,80-843`) re-expressed over
    * the events domain, in two scans:
    *   pass 1 (tiny result): quartiles + exact-decimal sums for mean/stddev
    *     of value and of the per-leg rate — broadcast as one row;
    *   pass 2: every check is a conditional-count aggregate over the
    *     window-derived legs, so 16 checks cost one shuffle-free projection
    *     plus one single-row aggregation regardless of check count.
    *
    * Check analogs (events domain ↔ reference flight domain):
    *   completeness/validity/consistency/uniqueness/accuracy/timeliness
    *   (:80-374 verbatim shapes), value_range ↔ altitude_range 3×IQR
    *   (:376-435), rate_range ↔ speed_range (:437-495), coordinate_validity
    *   incl. null-island + lat==lon suspicion (:497-554), id_format ↔
    *   callsign_format (:556-591), domain ↔ country_code (:593-625),
    *   ts_consistency (:627-666), precision ↔ position_accuracy ≤N-decimals
    *   (:668-710), value_jump ↔ altitude_consistency |Δ|≤bound (:712-751),
    *   type_value ↔ speed_consistency phase rules (:753-796), anomaly 3σ on
    *   value AND rate (:798-843). Mean/stddev come from exact decimal sums
    *   (sample variance, ddof=1 like pandas .std()) because distributed
    *   stddev of doubles is accumulation-order-dependent.
    */
  /** The 16-check suite's (score column, pass threshold) table — shared by
    * q41 (which computes and scores them) and [[Metrics.metricsRow]]'s
    * per-check dimensional breakdown (the reference publishes one metric
    * per check with a CheckName dimension,
    * `data_quality/metrics_publisher.py` via
    * `data_quality_validator.py:931-989`). */
  val SuiteChecks: Seq[(String, Double)] = Seq(
    "completeness_score" -> 0.8, "validity_score" -> 0.9,
    "consistency_score" -> 0.85, "uniqueness_score" -> 0.95,
    "accuracy_score" -> 0.7, "timeliness_score" -> 0.8,
    "value_range_score" -> 0.95, "rate_range_score" -> 0.95,
    "coordinate_score" -> 0.98, "id_format_score" -> 0.9,
    "domain_score" -> 0.95, "ts_consistency_score" -> 0.9,
    "precision_score" -> 0.95, "value_jump_score" -> 0.8,
    "type_value_score" -> 0.8, "anomaly_score" -> 0.95)

  def q41BatchCheckSuite(spark: SparkSession, dir: String): DataFrame = {
    val refNow = Quality.RefNowEpoch
    val eBase = Tables.withSyntheticPositions(Tables.events(spark, dir))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(expr("ts_ns div 1000"), col("event_id"))
    val tsS = expr("ts_ns div 1000000000")
    val dtS = (expr("ts_ns div 1000") - lag(expr("ts_ns div 1000"), 1).over(w)) /
      lit(1000000.0)
    val dv = col("value") - lag(col("value"), 1).over(w)
    val e = eBase
      .withColumn("dv_r", Exprs.dround(dv, 2))
      .withColumn("rate_r", Exprs.dround(when(dtS > 0, dv / dtS), 6))
    val stats = e.agg(
      count(col("value")).as("v_n"),
      Exprs.sumExact(col("value"), 2).as("v_sum"),
      Exprs.sumExact(col("value") * col("value"), 4).as("v_sum2"),
      count(col("rate_r")).as("r_n"),
      Exprs.sumExact(col("rate_r"), 6).as("r_sum"),
      Exprs.sumExact(col("rate_r") * col("rate_r"), 12).as("r_sum2"))
      // quartiles from the pre-window relation (value is untouched by the
      // window) via exact order statistics — engine-version robust
      .crossJoin(Pct.relation(eBase, Nil, "value",
        Seq("v_q1" -> 0.25, "v_q3" -> 0.75)))
    val j = e.crossJoin(broadcast(stats))

    val validTypes = Seq("click", "view", "purchase", "signup", "error")
    val n = count(lit(1))
    def cnt(c: Column) = count(when(c, 1))
    def r6(c: Column) = Exprs.dround(c, 6)
    val iqr = col("v_q3") - col("v_q1")
    val vLo = col("v_q1") - lit(3.0) * iqr
    val vHi = col("v_q3") + lit(3.0) * iqr
    val vMean = col("v_sum") / col("v_n")
    val vStd = sqrt(greatest(
      (col("v_sum2") - col("v_sum") * col("v_sum") / col("v_n")) /
        (col("v_n") - 1), lit(0.0)))
    val rMean = col("r_sum") / col("r_n")
    val rStd = sqrt(greatest(
      (col("r_sum2") - col("r_sum") * col("r_sum") / col("r_n")) /
        (col("r_n") - 1), lit(0.0)))
    val age = lit(refNow) - tsS

    val agged = j.agg(
      n.as("n_rows"),
      r6((count(col("value")) + count(col("user_id")) + count(col("props"))) /
        (lit(3) * n)).as("completeness_score"),
      r6(greatest(lit(0.0), lit(1.0) -
        (cnt(col("value") < 0 || col("value") > 1000) +
         cnt(col("lat") > 90 || col("lat") < -90) +
         cnt(col("lon") > 180 || col("lon") < -180) +
         cnt(col("user_id") < 0) +
         cnt(col("event_type").isNotNull &&
             !col("event_type").isin(validTypes: _*))) / (lit(5) * n)))
        .as("validity_score"),
      r6(lit(1.0) -
        (cnt(col("event_type") === "purchase" && col("value") <= 0) +
         cnt(col("event_type") === "error" && col("value") > 500)) / n)
        .as("consistency_score"),
      r6(countDistinct(col("event_id")) / n).as("uniqueness_score"),
      r6((cnt(col("lat").isNotNull && col("lon").isNotNull) +
          count(col("value")) + count(col("props"))) / (lit(3) * n))
        .as("accuracy_score"),
      r6(cnt(age <= 604800L) / n).as("timeliness_score"),
      Exprs.dround(sum(age) / n, 1).as("avg_age_s"),
      r6(greatest(lit(0.0), lit(1.0) -
        (cnt(col("value") < -1000) + cnt(col("value") > 60000) +
         cnt(col("value") < vLo || col("value") > vHi)) / count(col("value"))))
        .as("value_range_score"),
      r6(lit(1.0) - cnt(abs(col("rate_r")) > 0.5) / count(col("rate_r")))
        .as("rate_range_score"),
      r6(lit(1.0) -
        // lat==lon via tolerance: DuckDB's 3.6 literal is DECIMAL, so its
        // lon is the exact value while Spark's is the double product — a
        // 1-ulp gap that flips exact equality on mathematically-equal rows
        cnt(col("lat").isNotNull && col("lon").isNotNull &&
            (abs(col("lat")) > 90 || abs(col("lon")) > 180 ||
             (abs(col("lat")) < 0.1 && abs(col("lon")) < 0.1) ||
             abs(col("lat") - col("lon")) < 1e-9)) /
          cnt(col("lat").isNotNull && col("lon").isNotNull))
        .as("coordinate_score"),
      r6(cnt(col("props").rlike("^\\{.*\\}$")) / count(col("props")))
        .as("id_format_score"),
      r6(cnt(col("event_type").isin(validTypes: _*)) / count(col("event_type")))
        .as("domain_score"),
      r6(cnt(tsS <= refNow && tsS >= refNow - 3888000L) / n)
        .as("ts_consistency_score"),
      r6(cnt(Exprs.dround(col("value"), 2) === col("value")) / count(col("value")))
        .as("precision_score"),
      r6(cnt(abs(col("dv_r")) <= 400) / count(col("dv_r")))
        .as("value_jump_score"),
      r6((cnt(col("event_type") === "signup" && col("value") < 100) +
          cnt(col("event_type") =!= "signup" && col("value") >= 0.01)) / n)
        .as("type_value_score"),
      r6(greatest(lit(0.0), lit(1.0) -
        (cnt(abs(col("value") - vMean) > lit(3.0) * vStd) +
         cnt(abs(col("rate_r") - rMean) > lit(3.0) * rStd)) / n))
        .as("anomaly_score"))

    val scoreCols = SuiteChecks
    val passed = scoreCols.map { case (c, thr) => (col(c) >= thr).cast("int") }
      .reduce(_ + _)
    val overall = Exprs.dround(
      scoreCols.map { case (c, _) => col(c) }.reduce(_ + _) / lit(16.0), 6)
    agged
      .withColumn("passed_checks", passed)
      .withColumn("total_checks", lit(16))
      .withColumn("overall_score", overall)
      .withColumn("grade", Exprs.gradeOf(col("overall_score")))
  }

  /** q71 (Q8 family): MAD-based robust outliers — median absolute deviation
    * is the robust-statistics complement to the mean/stddev z-score (q06)
    * and the quartile fences (q40): a few extreme values cannot drag the
    * threshold because both center and spread are medians. Two aggregation
    * passes (median, then median of |x − med|), both tiny broadcast joins;
    * robust z = 0.6745·(x − med)/MAD, flagged above 3.5 (the standard
    * Iglewicz-Hoaglin cutoff, public literature). */
  def q71MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val med = Pct.relation(e, Seq("event_type"), "value", Seq("med" -> 0.5))
    val withDev = e.join(broadcast(med), "event_type")
      .withColumn("absdev", abs(col("value") - col("med")))
    val mad = Pct.relation(withDev, Seq("event_type"), "absdev",
      Seq("mad" -> 0.5))
    val rz = lit(0.6745) * (col("value") - col("med")) / col("mad")
    withDev.join(broadcast(mad), "event_type")
      .withColumn("robust_z", Exprs.dround(rz, 4))
      .groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        Exprs.dround(min(col("med")), 4).as("median"),
        Exprs.dround(min(col("mad")), 4).as("mad"),
        count(when(abs(col("robust_z")) > 3.5, 1)).as("n_outliers"),
        Exprs.dround(max(abs(col("robust_z"))), 4).as("max_abs_rz"))
      .orderBy(col("event_type"))
  }

  /** The timestamp is profiled at the MICRO grain (`ts_us` = ts_ns div
    * 1000): the oracle engine reads nano-precision parquet at micro
    * precision, so nano-grain min/max/distinct would compare different
    * quantities (the repo-wide `ts_ns div 1000` ↔ `epoch_us(ts)`
    * convention, CLAUDE.md). */
  private val ProfileCols =
    Seq("event_id", "ts_us", "user_id", "event_type", "value", "props")

  /** Type-aware metric sets for the q97 profile. ts_us gets min/max but NOT
    * percentiles: interpolating ~1.7e15-magnitude values amplifies the
    * cross-engine formula difference ((1-g)·a + g·b vs a + (b-a)·g) to
    * observable ulps (measured 4 ulps on the nano grain at sf0.01), while
    * the small-magnitude columns are bitwise identical across engines at
    * both sf0.01 and sf0.1. All numeric min/max are emitted as BIGINT —
    * the long columns raw (event_id/ts_us/user_id are exact longs), the
    * 2dp `value` as half-up cents (floor(x·100 + 0.5)) — so no DOUBLE or
    * DECIMAL emission survives to the hash (r08 verdict: q97 was the only
    * driver-red row for three rounds with rows/schema green; integer
    * equality cannot diverge across DuckDB builds). */
  private val NumCols = Seq("event_id", "ts_us", "user_id", "value")

  /** Percentiles only for `value`: a percentile of a surrogate key is
    * profile noise, and the r07 driver gate proved the built-in
    * percentile/quantile_cont pairing is only EMPIRICALLY bitwise-equal —
    * the local DuckDB matched while the driver's build didn't (q97 the
    * only red row). p50/p95 of value are now derived from exact order
    * statistics (below) with the interpolation spelled out identically in
    * both engines, so equality holds by construction, not by engine
    * version. */
  private val PctCols = Seq("value")
  private val StrCols = Seq("event_type", "props")

  /** Exact p50/p95 of `value` as a 1-row relation, engine-version-robust.
    *
    * value is a fixed-scale 2dp double, so its distinct grid is bounded
    * (~49k cells) regardless of row count: groupBy(value) + one
    * single-partition cumsum window over the grid is scale-safe where a
    * full-column sort is not. Ranks are integers (cum > lo is a
    * BIGINT compare), the interpolation fraction g is computed with the
    * same IEEE double ops in both engines ((n-1)::double * 0.95::double −
    * its floor; 0.5 for the median is dyadic), and the final
    * a + (b − a)·g is rounded half-up via floor(x·1e4 + 0.5)/1e4 — the
    * r6 q108 pattern that is hash-safe where round() is not. */
  private[graft] def valuePctRelation(e: DataFrame): DataFrame = {
    val vc = e.where(col("value").isNotNull)
      .groupBy(col("value")).agg(count(lit(1)).as("c"))
    val cumW = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vcc = vc
      .withColumn("cum", sum(col("c")).over(cumW))
      .withColumn("nn", sum(col("c")).over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    val lo50 = expr("(nn - 1) div 2")
    val g50 = when(((col("nn") - 1) % 2) === 1, lit(0.5)).otherwise(lit(0.0))
    val r95 = (col("nn") - 1).cast("double") * lit(0.95)
    val lo95 = floor(r95)
    val g95 = r95 - lo95.cast("double")
    val pa = vcc.agg(
      min(when(col("cum") > lo50, col("value"))).as("a50"),
      min(when(col("cum") > lo50 + 1, col("value"))).as("b50r"),
      min(when(col("cum") > lo95, col("value"))).as("a95"),
      min(when(col("cum") > lo95 + 1, col("value"))).as("b95r"),
      max(g50).as("g50"), max(g95).as("g95"))
    // raw interpolation a + (b − a)·g, then half-up scaling via floor; the
    // ×10000 BIGINT variants (no division back) are what q97 emits — integer
    // equality cannot diverge across DuckDB builds (r08 verdict rule).
    def interpRaw(a: Column, b: Column, g: Column): Column =
      a + (coalesce(b, a) - a) * g
    def interp(a: Column, b: Column, g: Column): Column =
      floor(interpRaw(a, b, g) * 10000 + 0.5) / 10000
    def interpX10k(a: Column, b: Column, g: Column): Column =
      floor(interpRaw(a, b, g) * 10000 + 0.5)
    pa.select(
      interp(col("a50"), col("b50r"), col("g50")).as("p50_value"),
      interp(col("a95"), col("b95r"), col("g95")).as("p95_value"),
      interpX10k(col("a50"), col("b50r"), col("g50")).as("p50_x10k"),
      interpX10k(col("a95"), col("b95r"), col("g95")).as("p95_x10k"))
  }

  /** q97: table profile — per column: presence, null share, distinct
    * cardinality, and type-aware statistics: numeric columns get exact
    * min/max plus exact-interpolated p50/p95, string columns get
    * min/max/avg length. The "ANALYZE TABLE"-style statistics pass a
    * pipeline runs on a landed batch before ingestion (the reference
    * stores per-batch quality metrics for the same purpose,
    * `sql/athena/03_create_processed_tables.sql:140-191`); its output also
    * feeds the optimizer-facing decisions this repo makes by hand
    * (broadcast eligibility, distinct-count-based join strategies,
    * q98-style salting calls).
    *
    * Scale shape: TWO aggregation passes over the pruned scan, cross-joined
    * as 1-row relations. They must not fuse: a single agg mixing the
    * multi-column distinct counts with `percentile` plans as one Expand
    * whose partial aggregate groups by the distinct-key columns — and
    * allocates every percentile's TypedImperative buffer PER GROUP (unique
    * event_id → one OpenHashMap per row-value per percentile, millions of
    * object buffers built and serialized through the exchange; measured
    * 6.6 s warm on a 100 k-row batch, 2.9 s split). Pass 1 (stats) is a
    * single-group ObjectHashAggregate — percentile buffers exist once per
    * partition; pass 2 (distinct counts) keeps the Expand but its
    * aggregates are plain codegen counts. Exact `percentile` buffers a
    * value→count map per partition, fine for bounded-cardinality batch
    * profiling; at 100 TB swap in `approx_percentile` (the q46 path) —
    * same plan shape, mergeable sketch state. */
  def q97SchemaProfile(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
    val statAggs = count(lit(1)).as("n") +: ProfileCols.flatMap { c =>
      Seq(count(col(c)).as(s"np_$c")) ++
      (if (NumCols.contains(c)) Seq(
        (if (c == "value") floor(min(col(c)) * 100 + lit(0.5))
         else min(col(c))).cast("long").as(s"mn_$c"),
        (if (c == "value") floor(max(col(c)) * 100 + lit(0.5))
         else max(col(c))).cast("long").as(s"mx_$c")) else Nil) ++
      (if (StrCols.contains(c)) Seq(
        min(length(col(c))).as(s"lmin_$c"),
        max(length(col(c))).as(s"lmax_$c"),
        sum(length(col(c))).cast("long").as(s"lsum_$c")) else Nil)
    }
    val ndAggs = ProfileCols.map(c => countDistinct(col(c)).as(s"nd_$c"))
    val one = e.agg(statAggs.head, statAggs.tail: _*)
      .crossJoin(e.agg(ndAggs.head, ndAggs.tail: _*))
      .crossJoin(valuePctRelation(e))
    val nullL = lit(null).cast("long")
    val entries = array(ProfileCols.map { c =>
      struct(
        lit(c).as("column_name"),
        col(s"np_$c").as("n_present"),
        col(s"nd_$c").as("n_distinct"),
        (if (NumCols.contains(c)) col(s"mn_$c") else nullL).as("min_num"),
        (if (NumCols.contains(c)) col(s"mx_$c") else nullL).as("max_num"),
        (if (PctCols.contains(c)) col("p50_x10k") else nullL).as("p50_x10k"),
        (if (PctCols.contains(c)) col("p95_x10k") else nullL).as("p95_x10k"),
        (if (StrCols.contains(c)) col(s"lmin_$c")
         else lit(null).cast("int")).as("min_len"),
        (if (StrCols.contains(c)) col(s"lmax_$c")
         else lit(null).cast("int")).as("max_len"),
        // half-up ×10000 average length in pure BIGINT arithmetic:
        // (2·lsum·10⁴ + np) div (2·np) ≡ round(lsum/np · 10⁴) for np > 0
        (if (StrCols.contains(c))
           expr(s"(2 * lsum_$c * 10000 + np_$c) div (2 * np_$c)")
         else nullL).as("avg_len_x10k"))
    }: _*)
    one.select(col("n"), explode(entries).as("p"))
      .select(col("p.column_name"), col("n"), col("p.n_present"),
        (col("n") - col("p.n_present")).as("n_null"),
        col("p.n_distinct"), col("p.min_num"), col("p.max_num"),
        col("p.p50_x10k"), col("p.p95_x10k"),
        col("p.min_len"), col("p.max_len"), col("p.avg_len_x10k"))
      // null share in half-up basis-points-of-basis-points (pct × 10⁴),
      // again pure BIGINT: (2·n_null·10⁶ + n) div (2·n)
      .withColumn("null_bp", expr("(2 * n_null * 1000000 + n) div (2 * n)"))
      .select(col("column_name"), col("n"), col("n_present"), col("n_null"),
        col("null_bp"), col("n_distinct"), col("min_num"), col("max_num"),
        col("p50_x10k"), col("p95_x10k"),
        col("min_len"), col("max_len"), col("avg_len_x10k"))
      .orderBy(col("column_name"))
  }

  /** The SQL mirror of [[valuePctRelation]], op-for-op (CTEs `vc`/`vcc`/
    * `pa`/`pct`, emitting `pct(p50_value, p95_value)`), parameterized on
    * the source relation so q97 profiles the clean corpus and q126's
    * analyzer summary the planted-corruption one. */
  private[graft] def valuePctCtes(from: String): String =
    s"""vc AS (SELECT value AS v, count(*) AS c FROM $from
      |       WHERE value IS NOT NULL GROUP BY value),
      |vcc AS (SELECT v,
      |  sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |               AND CURRENT ROW) AS cum,
      |  sum(c) OVER () AS nn FROM vc),
      |pa AS (SELECT
      |  min(CASE WHEN cum > ((nn - 1) // 2) THEN v END) AS a50,
      |  min(CASE WHEN cum > ((nn - 1) // 2) + 1 THEN v END) AS b50r,
      |  min(CASE WHEN cum >
      |    floor((nn - 1)::DOUBLE * 0.95::DOUBLE)::BIGINT THEN v END) AS a95,
      |  min(CASE WHEN cum >
      |    floor((nn - 1)::DOUBLE * 0.95::DOUBLE)::BIGINT + 1 THEN v END) AS b95r,
      |  max(CASE WHEN (nn - 1) % 2 = 1 THEN 0.5::DOUBLE
      |      ELSE 0.0::DOUBLE END) AS g50,
      |  max((nn - 1)::DOUBLE * 0.95::DOUBLE -
      |      floor((nn - 1)::DOUBLE * 0.95::DOUBLE)) AS g95
      |  FROM vcc),
      |pct AS (SELECT
      |  floor((a50 + (coalesce(b50r, a50) - a50) * g50) * 10000 + 0.5)
      |    / 10000 AS p50_value,
      |  floor((a95 + (coalesce(b95r, a95) - a95) * g95) * 10000 + 0.5)
      |    / 10000 AS p95_value,
      |  floor((a50 + (coalesce(b50r, a50) - a50) * g50) * 10000 + 0.5)
      |    ::BIGINT AS p50_x10k,
      |  floor((a95 + (coalesce(b95r, a95) - a95) * g95) * 10000 + 0.5)
      |    ::BIGINT AS p95_x10k
      |  FROM pa)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q97_schema_profile" -> {
      val stats = ProfileCols.map { c =>
        val base = s"count($c) AS np_$c, count(DISTINCT $c) AS nd_$c"
        val num =
          if (c == "value")
            s", floor(min($c) * 100 + 0.5)::BIGINT AS mn_$c," +
              s" floor(max($c) * 100 + 0.5)::BIGINT AS mx_$c"
          else if (NumCols.contains(c))
            s", min($c)::BIGINT AS mn_$c, max($c)::BIGINT AS mx_$c"
          else ""
        val len =
          if (StrCols.contains(c))
            s", min(length($c)) AS lmin_$c, max(length($c)) AS lmax_$c," +
              s" sum(length($c))::BIGINT AS lsum_$c"
          else ""
        base + num + len
      }.mkString(", ")
      val rows = ProfileCols.map { c =>
        val mn = if (NumCols.contains(c)) s"mn_$c" else "NULL::BIGINT"
        val mx = if (NumCols.contains(c)) s"mx_$c" else "NULL::BIGINT"
        val p50 = if (PctCols.contains(c)) "p50_x10k" else "NULL::BIGINT"
        val p95 = if (PctCols.contains(c)) "p95_x10k" else "NULL::BIGINT"
        val lmin = if (StrCols.contains(c)) s"lmin_$c" else "NULL::INT"
        val lmax = if (StrCols.contains(c)) s"lmax_$c" else "NULL::INT"
        val alen = if (StrCols.contains(c))
          s"(2 * lsum_$c * 10000 + np_$c) // (2 * np_$c)" else "NULL::BIGINT"
        s"""SELECT '$c' AS column_name, n, np_$c AS n_present,
           |  n - np_$c AS n_null,
           |  (2 * (n - np_$c) * 1000000 + n) // (2 * n) AS null_bp,
           |  nd_$c AS n_distinct,
           |  $mn AS min_num, $mx AS max_num,
           |  $p50 AS p50_x10k, $p95 AS p95_x10k,
           |  $lmin AS min_len, $lmax AS max_len, $alen AS avg_len_x10k
           |FROM stats, pct""".stripMargin
      }.mkString("\n UNION ALL\n")
      // Every emitted statistic is BIGINT (or INT/STRING): percentiles as
      // exact-order-statistic ×10⁴ (valuePctCtes p50_x10k), averages and
      // null shares as half-up integer-scaled ratios via pure BIGINT
      // arithmetic, value min/max as half-up cents, long columns raw.
      // Integer equality cannot diverge across DuckDB builds — the r07/r08
      // driver gate proved double-derived emissions (round(), DECIMAL)
      // can, with rows/schema green and only the hash red.
      s"""WITH base AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
        |    value, props
        |  FROM events),
        |stats AS (SELECT count(*) AS n, $stats FROM base),
        |${valuePctCtes(from = "base")}
        |$rows
        |ORDER BY column_name""".stripMargin
    },

    "q71_mad_outliers" ->
      s"""WITH ${Pct.ctes("med", "events", Seq("event_type"), "value",
            Seq("med" -> 0.5))},
        |dev AS (
        |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS absdev
        |  FROM events e JOIN med m ON e.event_type = m.event_type),
        |${Pct.ctes("mad", "dev", Seq("event_type"), "absdev",
            Seq("mad" -> 0.5))},
        |scored AS (
        |  SELECT d.event_type, d.value, d.med, a.mad,
        |    round(0.6745 * (d.value - d.med) / a.mad * 10000) / 10000 AS robust_z
        |  FROM dev d JOIN mad a ON d.event_type = a.event_type)
        |SELECT event_type, count(*) AS n,
        |  round(min(med) * 10000) / 10000 AS median,
        |  round(min(mad) * 10000) / 10000 AS mad,
        |  count(CASE WHEN abs(robust_z) > 3.5 THEN 1 END) AS n_outliers,
        |  round(max(abs(robust_z)) * 10000) / 10000 AS max_abs_rz
        |FROM scored GROUP BY event_type ORDER BY event_type""".stripMargin,

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
      s"""WITH ${Pct.ctes("quartiles", "events", Seq("event_type"), "value",
            Seq("q1" -> 0.25, "q3" -> 0.75))},
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
      s"""WITH base AS (
        |  SELECT *, epoch_us(ts) AS t_us, epoch_us(ts) // 1000000 AS ts_s,
        |    value - 50 AS lat,
        |    CAST(json_extract_string(props, '$$.k') AS INTEGER) * 3.6::DOUBLE - 180 AS lon
        |  FROM events),
        |legs AS (
        |  SELECT *, lag(value) OVER w AS pvalue, lag(t_us) OVER w AS pt_us
        |  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |derived AS (
        |  SELECT *,
        |    round((value - pvalue) * 100) / 100 AS dv_r,
        |    round(CASE WHEN (t_us - pt_us) / 1000000.0 > 0
        |      THEN (value - pvalue) / ((t_us - pt_us) / 1000000.0) END * 1000000) / 1000000 AS rate_r
        |  FROM legs),
        |stats AS (
        |  SELECT count(value) AS v_n,
        |    sum(value::DECIMAL(25,2))::DOUBLE AS v_sum,
        |    sum((value * value)::DECIMAL(25,4))::DOUBLE AS v_sum2,
        |    count(rate_r) AS r_n,
        |    sum(rate_r::DECIMAL(25,6))::DOUBLE AS r_sum,
        |    sum((rate_r * rate_r)::DECIMAL(25,12))::DOUBLE AS r_sum2
        |  FROM derived),
        |${Pct.ctes("vq", "base", Nil, "value",
            Seq("v_q1" -> 0.25, "v_q3" -> 0.75))},
        |agged AS (
        |  SELECT count(*) AS n_rows,
        |    round((count(value) + count(user_id) + count(props)) / (3 * count(*)) * 1000000) / 1000000 AS completeness_score,
        |    round(greatest(0.0, 1.0 -
        |      (count(CASE WHEN value < 0 OR value > 1000 THEN 1 END) +
        |       count(CASE WHEN lat > 90 OR lat < -90 THEN 1 END) +
        |       count(CASE WHEN lon > 180 OR lon < -180 THEN 1 END) +
        |       count(CASE WHEN user_id < 0 THEN 1 END) +
        |       count(CASE WHEN event_type IS NOT NULL AND event_type NOT IN ('click','view','purchase','signup','error') THEN 1 END)
        |      ) / (5 * count(*))) * 1000000) / 1000000 AS validity_score,
        |    round((1.0 -
        |      (count(CASE WHEN event_type = 'purchase' AND value <= 0 THEN 1 END) +
        |       count(CASE WHEN event_type = 'error' AND value > 500 THEN 1 END)
        |      ) / count(*)) * 1000000) / 1000000 AS consistency_score,
        |    round(count(DISTINCT event_id) / count(*) * 1000000) / 1000000 AS uniqueness_score,
        |    round((count(CASE WHEN lat IS NOT NULL AND lon IS NOT NULL THEN 1 END) +
        |       count(value) + count(props)) / (3 * count(*)) * 1000000) / 1000000 AS accuracy_score,
        |    round(count(CASE WHEN 1706659200 - ts_s <= 604800 THEN 1 END) / count(*) * 1000000) / 1000000 AS timeliness_score,
        |    round(sum(1706659200 - ts_s)::BIGINT / count(*) * 10) / 10 AS avg_age_s,
        |    round(greatest(0.0, 1.0 -
        |      (count(CASE WHEN value < -1000 THEN 1 END) +
        |       count(CASE WHEN value > 60000 THEN 1 END) +
        |       count(CASE WHEN value < v_q1 - 3.0 * (v_q3 - v_q1) OR value > v_q3 + 3.0 * (v_q3 - v_q1) THEN 1 END)
        |      ) / count(value)) * 1000000) / 1000000 AS value_range_score,
        |    round((1.0 - count(CASE WHEN abs(rate_r) > 0.5 THEN 1 END) / count(rate_r)) * 1000000) / 1000000 AS rate_range_score,
        |    round((1.0 -
        |      count(CASE WHEN lat IS NOT NULL AND lon IS NOT NULL AND
        |        (abs(lat) > 90 OR abs(lon) > 180 OR (abs(lat) < 0.1 AND abs(lon) < 0.1) OR abs(lat - lon) < 1e-9) THEN 1 END) /
        |      count(CASE WHEN lat IS NOT NULL AND lon IS NOT NULL THEN 1 END)) * 1000000) / 1000000 AS coordinate_score,
        |    round(count(CASE WHEN regexp_matches(props, '^\\{.*\\}$$') THEN 1 END) / count(props) * 1000000) / 1000000 AS id_format_score,
        |    round(count(CASE WHEN event_type IN ('click','view','purchase','signup','error') THEN 1 END) / count(event_type) * 1000000) / 1000000 AS domain_score,
        |    round(count(CASE WHEN ts_s <= 1706659200 AND ts_s >= 1706659200 - 3888000 THEN 1 END) / count(*) * 1000000) / 1000000 AS ts_consistency_score,
        |    round(count(CASE WHEN round(value * 100) / 100 = value THEN 1 END) / count(value) * 1000000) / 1000000 AS precision_score,
        |    round(count(CASE WHEN abs(dv_r) <= 400 THEN 1 END) / count(dv_r) * 1000000) / 1000000 AS value_jump_score,
        |    round((count(CASE WHEN event_type = 'signup' AND value < 100 THEN 1 END) +
        |       count(CASE WHEN event_type <> 'signup' AND value >= 0.01 THEN 1 END)) / count(*) * 1000000) / 1000000 AS type_value_score,
        |    round(greatest(0.0, 1.0 -
        |      (count(CASE WHEN abs(value - v_sum / v_n) > 3.0 * sqrt(greatest((v_sum2 - v_sum * v_sum / v_n) / (v_n - 1), 0.0)) THEN 1 END) +
        |       count(CASE WHEN abs(rate_r - r_sum / r_n) > 3.0 * sqrt(greatest((r_sum2 - r_sum * r_sum / r_n) / (r_n - 1), 0.0)) THEN 1 END)
        |      ) / count(*)) * 1000000) / 1000000 AS anomaly_score
        |  FROM derived CROSS JOIN stats CROSS JOIN vq),
        |scored AS (
        |  SELECT *,
        |    (CASE WHEN completeness_score >= 0.8 THEN 1 ELSE 0 END +
        |     CASE WHEN validity_score >= 0.9 THEN 1 ELSE 0 END +
        |     CASE WHEN consistency_score >= 0.85 THEN 1 ELSE 0 END +
        |     CASE WHEN uniqueness_score >= 0.95 THEN 1 ELSE 0 END +
        |     CASE WHEN accuracy_score >= 0.7 THEN 1 ELSE 0 END +
        |     CASE WHEN timeliness_score >= 0.8 THEN 1 ELSE 0 END +
        |     CASE WHEN value_range_score >= 0.95 THEN 1 ELSE 0 END +
        |     CASE WHEN rate_range_score >= 0.95 THEN 1 ELSE 0 END +
        |     CASE WHEN coordinate_score >= 0.98 THEN 1 ELSE 0 END +
        |     CASE WHEN id_format_score >= 0.9 THEN 1 ELSE 0 END +
        |     CASE WHEN domain_score >= 0.95 THEN 1 ELSE 0 END +
        |     CASE WHEN ts_consistency_score >= 0.9 THEN 1 ELSE 0 END +
        |     CASE WHEN precision_score >= 0.95 THEN 1 ELSE 0 END +
        |     CASE WHEN value_jump_score >= 0.8 THEN 1 ELSE 0 END +
        |     CASE WHEN type_value_score >= 0.8 THEN 1 ELSE 0 END +
        |     CASE WHEN anomaly_score >= 0.95 THEN 1 ELSE 0 END) AS passed_checks,
        |    16 AS total_checks,
        |    round((completeness_score + validity_score + consistency_score +
        |      uniqueness_score + accuracy_score + timeliness_score +
        |      value_range_score + rate_range_score + coordinate_score +
        |      id_format_score + domain_score + ts_consistency_score +
        |      precision_score + value_jump_score + type_value_score +
        |      anomaly_score) / 16.0 * 1000000) / 1000000 AS overall_score
        |  FROM agged)
        |SELECT *,
        |  CASE WHEN overall_score >= 0.95 THEN 'A'
        |       WHEN overall_score >= 0.85 THEN 'B'
        |       WHEN overall_score >= 0.70 THEN 'C'
        |       WHEN overall_score >= 0.50 THEN 'D'
        |       ELSE 'F' END AS grade
        |FROM scored""".stripMargin,
  )
}
