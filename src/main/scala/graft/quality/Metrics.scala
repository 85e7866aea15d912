package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Exprs

/** Quality-metrics side-sink — the engine-scope analog of the reference's
  * CloudWatch publisher + SNS alert egress
  * (`src/lambda/data_transformation/data_quality_validator.py:931-1021`
  * publish_quality_metrics/send_alert, `src/lambda/data_quality/
  * metrics_publisher.py`). Instead of pushing to a metrics service, every
  * validation run APPENDS one row to a `_metrics` parquet ledger next to the
  * data: the lakehouse-native metrics bus. Dashboards read it with partition
  * pruning on `run_id`; an external publisher can tail it; and the alert
  * decision (flag + severity) is materialized in the row itself so alert
  * routing needs no recomputation.
  *
  * Thresholds mirror the reference's defaults: alert below
  * QUALITY_THRESHOLD = 0.8 (`data_quality_validator.py:28`), severity bands
  * from `data_quality/config.py:44-57` (acceptable 0.75, auto-quarantine
  * 0.50) with the reference's LOW/MEDIUM/HIGH/CRITICAL scale.
  *
  * Scale shape: the input is always an already-aggregated one-row check
  * result (q41's 16-check suite or [[batchQualityCheck]]'s streaming
  * subset), so the sink cost is one tiny parquet append per run — metrics
  * cost never grows with corpus size.
  */
object Metrics {

  /** `QUALITY_THRESHOLD` default (`data_quality_validator.py:28`). */
  val DefaultQualityThreshold = 0.8

  /** `acceptable_threshold` / `auto_quarantine_threshold`
    * (`data_quality/config.py:46,57`). */
  val AcceptableThreshold = 0.75
  val QuarantineThreshold = 0.50

  /** Project a one-row check result (must carry `n_rows`, `passed_checks`,
    * `total_checks`, `overall_score`, `grade` — q41's output shape) onto the
    * metrics-ledger schema: the reference's five published metrics
    * (ValidationTime, OverallQualityScore as a percentage, PassedChecks,
    * FailedChecks, RecordsValidated) plus the materialized alert decision. */
  def metricsRow(check: DataFrame, runId: String, validationTimeS: Double,
                 threshold: Double = DefaultQualityThreshold): DataFrame =
    check.select(
      lit(runId).as("run_id"),
      Exprs.dround(lit(validationTimeS), 3).as("validation_time_s"),
      col("n_rows").cast("long").as("records_validated"),
      col("passed_checks").cast("long").as("passed_checks"),
      (col("total_checks") - col("passed_checks")).cast("long")
        .as("failed_checks"),
      col("overall_score"),
      Exprs.dround(col("overall_score") * 100, 4).as("overall_score_pct"),
      col("grade"),
      (col("overall_score") < threshold).as("quality_alert"),
      when(col("overall_score") < QuarantineThreshold, "CRITICAL")
        .when(col("overall_score") < AcceptableThreshold, "HIGH")
        .when(col("overall_score") < threshold, "MEDIUM")
        .otherwise("NONE").as("alert_severity"))

  /** Append one run's metrics row to the `_metrics` ledger.
    *
    * Replay-idempotent the same way `Streaming.writeBatch` is: the row lands
    * under its own `run_id=` partition with dynamic partition overwrite, so
    * a re-run (streaming batch replayed after a crash between sink commit
    * and checkpoint commit, or a batch job retried) replaces its own row
    * instead of double-appending it. */
  def writeMetrics(check: DataFrame, metricsDir: String, runId: String,
                   validationTimeS: Double,
                   threshold: Double = DefaultQualityThreshold): Unit = {
    check.sparkSession.conf
      .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    metricsRow(check, runId, validationTimeS, threshold)
      .write.mode("overwrite").partitionBy("run_id").parquet(metricsDir)
  }

  def readMetrics(spark: SparkSession, metricsDir: String): DataFrame =
    spark.read.parquet(metricsDir)

  /** Gap-based alert suppression (`alerting.py:79-125`
    * AlertSuppressionManager): emit an alert, then suppress every same-key
    * alert within `windowS` of the last EMITTED one; the first alert at
    * least `windowS` after it emits and restarts the window. This is NOT a
    * fixed-bucket dedup (three alerts 20 min apart under a 30-min window
    * must emit #1 and #3; a bucket grid gets that wrong at edges) — the
    * state is "timestamp of last emitted", which only an in-order pass
    * carries. Keys are (alert_type, component, severity), matching the
    * reference's suppression key.
    *
    * Scale shape: flatMapGroups per key — alerts are cadence-bounded
    * (thousands per key-month at worst, nothing like corpus scale), so the
    * per-group sort is safely partition-local and the shuffle is one hash
    * exchange on the key. Input columns: (alert_type, component, severity,
    * ts_s); output adds `emitted`. */
  def suppressAlerts(alerts: DataFrame, windowS: Long = 1800L): DataFrame = {
    val spark = alerts.sparkSession
    import spark.implicits._
    alerts
      .select(col("alert_type"), col("component"), col("severity"),
        col("ts_s"))
      .as[(String, String, String, Long)]
      .groupByKey { case (t, c, s, _) => (t, c, s) }
      .flatMapGroups { (key: (String, String, String),
                        it: Iterator[(String, String, String, Long)]) =>
        val (t, c, s) = key
        val sorted = it.map(_._4).toArray
        java.util.Arrays.sort(sorted)
        var lastEmit = Long.MinValue
        sorted.iterator.map { ts =>
          val emit = lastEmit == Long.MinValue || ts - lastEmit >= windowS
          if (emit) lastEmit = ts
          (t, c, s, ts, emit)
        }
      }
      .toDF("alert_type", "component", "severity", "ts_s", "emitted")
  }

  /** Streaming-side quality check over a micro-batch's columns (`event_id`,
    * `ts`, `user_id`, `event_type`, `value` — the poll-source schema): the
    * ingest-time subset of q41's suite, mirroring the reference's
    * transformation-side validation that runs per file before the full
    * batch validator (completeness / validity / uniqueness,
    * `data_quality_validator.py:80-374` shapes). One single-row aggregation
    * per micro-batch — conditional counts only, no windows, no shuffle
    * beyond the 1-row combine. */
  def batchQualityCheck(batch: DataFrame): DataFrame = {
    val validTypes = Seq("click", "view", "purchase", "signup", "error")
    val n = count(lit(1))
    def cnt(c: org.apache.spark.sql.Column) = count(when(c, 1))
    def r6(c: org.apache.spark.sql.Column) = Exprs.dround(c, 6)
    val agged = batch.agg(
      n.as("n_rows"),
      r6((count(col("user_id")) + count(col("value")) + count(col("ts"))) /
        (lit(3) * n)).as("completeness_score"),
      r6(greatest(lit(0.0), lit(1.0) -
        (cnt(col("value") < 0 || col("value") > 1000) +
         cnt(col("event_type").isNotNull &&
             !col("event_type").isin(validTypes: _*))) / (lit(2) * n)))
        .as("validity_score"),
      r6(countDistinct(col("event_id")) / n).as("uniqueness_score"))
    val scoreCols = Seq(
      "completeness_score" -> 0.8, "validity_score" -> 0.9,
      "uniqueness_score" -> 0.95)
    val passed = scoreCols.map { case (c, thr) => (col(c) >= thr).cast("int") }
      .reduce(_ + _)
    val overall = Exprs.dround(
      scoreCols.map { case (c, _) => col(c) }.reduce(_ + _) / lit(3.0), 6)
    agged
      .withColumn("passed_checks", passed)
      .withColumn("total_checks", lit(3))
      .withColumn("overall_score", overall)
      .withColumn("grade", Exprs.gradeOf(col("overall_score")))
  }
}
