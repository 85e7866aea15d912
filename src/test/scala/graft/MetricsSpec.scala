package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.quality.{BatchChecks, Metrics}
import graft.streaming.Streaming

/** Metrics side-sink (`_metrics` ledger) — the engine-scope analog of the
  * reference's CloudWatch publish + SNS alert egress. */
class MetricsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("q41's check row lands in the ledger with the published metric " +
      "fields and the materialized alert decision") {
    val dir = Files.createTempDirectory("metrics_out").toString
    val check = BatchChecks.q41BatchCheckSuite(spark, Sf0001)
    Metrics.writeMetrics(check, dir, runId = "run_1", validationTimeS = 1.234,
      checks = BatchChecks.SuiteChecks)
    val back = Metrics.readMetrics(spark, dir).collect()
    assert(back.length === 1)
    val r = back.head
    assert(r.getAs[String]("run_id") === "run_1")
    assert(r.getAs[Double]("validation_time_s") === 1.234)
    assert(r.getAs[Long]("records_validated") > 0)
    assert(r.getAs[Long]("passed_checks") + r.getAs[Long]("failed_checks") === 16L)
    val score = r.getAs[Double]("overall_score")
    assert(r.getAs[Double]("overall_score_pct") === math.round(score * 1e6) / 1e6 * 100)
    // the alert decision is materialized, consistent with the score
    assert(r.getAs[Boolean]("quality_alert") === (score < 0.8))
    // the per-check dimensional breakdown (metrics_publisher.py's
    // one-metric-per-check publish): 16 structs, internally consistent
    // with the aggregate passed/failed counts and named without the
    // _score suffix
    val checksBack =
      r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("check_results"))
    assert(checksBack.length === 16)
    assert(checksBack.map(_.getAs[String]("check_name")).toSet
      === BatchChecks.SuiteChecks.map(_._1.stripSuffix("_score")).toSet)
    assert(checksBack.count(_.getAs[Boolean]("passed")).toLong
      === r.getAs[Long]("passed_checks"))
    checksBack.foreach { c =>
      assert(c.getAs[Boolean]("passed")
        === (c.getAs[Double]("score") >= c.getAs[Double]("threshold")))
    }
  }

  test("an empty micro-batch vacuously passes: no NULL scores, a defined " +
      "grade and a false (not NULL) alert flag") {
    val empty = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val check = Metrics.batchQualityCheck(empty)
    val r = Metrics.metricsRow(check, "empty_run", 0.0,
      checks = Metrics.StreamingChecks).collect().head
    assert(r.getAs[Long]("records_validated") === 0L)
    assert(r.getAs[Double]("overall_score") === 1.0)
    assert(r.getAs[Long]("passed_checks") === 3L)
    assert(r.getAs[String]("grade") !== null)
    assert(r.getAs[Boolean]("quality_alert") === false)
    assert(r.getAs[String]("alert_severity") === "NONE")
  }

  test("severity bands follow the reference thresholds " +
      "(quarantine 0.50 / acceptable 0.75 / alert 0.80)") {
    def sev(score: Double): (Boolean, String) = {
      val check = Seq((100L, 10, 16, score, "X"))
        .toDF("n_rows", "passed_checks", "total_checks", "overall_score", "grade")
      val r = Metrics.metricsRow(check, "r", 0.0).collect().head
      (r.getAs[Boolean]("quality_alert"), r.getAs[String]("alert_severity"))
    }
    assert(sev(0.45) === ((true, "CRITICAL")))
    assert(sev(0.70) === ((true, "HIGH")))
    assert(sev(0.78) === ((true, "MEDIUM")))
    assert(sev(0.90) === ((false, "NONE")))
    // boundary: exactly at threshold is NOT an alert (reference:
    // passed_threshold = overall_score >= threshold)
    assert(sev(0.80) === ((false, "NONE")))
  }

  test("ledger appends across runs but replays of the SAME run replace " +
      "their own row") {
    val dir = Files.createTempDirectory("metrics_replay").toString
    val check = Seq((10L, 3, 3, 1.0, "A"))
      .toDF("n_rows", "passed_checks", "total_checks", "overall_score", "grade")
    Metrics.writeMetrics(check, dir, "run_1", 0.1)
    Metrics.writeMetrics(check, dir, "run_1", 0.2) // crash-replay of run_1
    Metrics.writeMetrics(check, dir, "run_2", 0.3)
    val back = Metrics.readMetrics(spark, dir)
    assert(back.count() === 2)
    assert(back.select("run_id").as[String].collect().sorted
      === Array("run_1", "run_2"))
  }

  test("alert suppression is gap-based per suppression key: emit restarts " +
      "the window, bucket-edge pairs both emit") {
    val alerts = Seq(
      // key A: emit@0, suppress 1000/1700 (<1800 of 0), emit@1900
      // (1900-0 >= 1800, restarts), suppress 3600 (3600-1900 < 1800)
      ("quality", "etl", "HIGH", 0L),
      ("quality", "etl", "HIGH", 1000L),
      ("quality", "etl", "HIGH", 1700L),
      ("quality", "etl", "HIGH", 1900L),
      ("quality", "etl", "HIGH", 3600L),
      // different severity = different suppression key: independent
      ("quality", "etl", "CRITICAL", 1000L),
      // a fixed 1800s bucket grid would suppress one of this >window pair
      ("volume", "api", "LOW", 1799L),
      ("volume", "api", "LOW", 3599L))
      .toDF("alert_type", "component", "severity", "ts_s")
    val rows = Metrics.suppressAlerts(alerts, windowS = 1800L).collect()
    val out = rows
      .map(r => (r.getString(0), r.getString(2), r.getLong(3)) ->
        r.getBoolean(4)).toMap
    assert(out(("quality", "HIGH", 0L)) === true)
    assert(out(("quality", "HIGH", 1000L)) === false)
    assert(out(("quality", "HIGH", 1700L)) === false)
    assert(out(("quality", "HIGH", 1900L)) === true)
    assert(out(("quality", "HIGH", 3600L)) === false)
    assert(out(("quality", "CRITICAL", 1000L)) === true)
    assert(out(("volume", "LOW", 1799L)) === true)
    assert(out(("volume", "LOW", 3599L)) === true) // 3599-1799 = 1800 >= window
    // each emitted alert reports the suppressed count since the previous
    // emission (alerting.py get_suppressed_count): resets on emit;
    // suppressed rows report nothing
    val since = rows.map(r =>
      (r.getString(0), r.getString(2), r.getLong(3)) ->
        Option(r.getAs[java.lang.Long]("suppressed_since_last"))).toMap
    assert(since(("quality", "HIGH", 0L)) === Some(0L))
    assert(since(("quality", "HIGH", 1000L)) === None)
    assert(since(("quality", "HIGH", 1900L)) === Some(2L)) // 1000 + 1700
    assert(since(("quality", "HIGH", 3600L)) === None)     // unreported tail
    assert(since(("quality", "CRITICAL", 1000L)) === Some(0L))
    assert(since(("volume", "LOW", 3599L)) === Some(0L))
  }

  test("streaming foreachBatch body writes the data AND its per-batch " +
      "metrics row") {
    val out = Files.createTempDirectory("wbm_out").toString
    val mDir = Files.createTempDirectory("wbm_metrics").toString
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val batch = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 10:06:00"), 2L, "view", 2.0),
      (2L, ts("2024-01-01 10:07:00"), 3L, "bogus", -5.0) // dup id + invalid
    ).toDF(cols: _*)
    Streaming.writeBatchWithMetrics(batch, 7L, out, mDir)
    assert(spark.read.parquet(out).count() === 3)
    val m = Metrics.readMetrics(spark, mDir).collect()
    assert(m.length === 1)
    val r = m.head
    assert(r.getAs[String]("run_id") === "batch_7")
    assert(r.getAs[Long]("records_validated") === 3L)
    // dup event_id fails uniqueness; bogus type + negative value fail
    // validity — 1 of 3 checks passes
    assert(r.getAs[Long]("passed_checks") === 1L)
    assert(r.getAs[Long]("failed_checks") === 2L)
    assert(r.getAs[Boolean]("quality_alert"))
    // replay of the same batch id replaces both outputs
    Streaming.writeBatchWithMetrics(batch, 7L, out, mDir)
    assert(spark.read.parquet(out).count() === 3)
    assert(Metrics.readMetrics(spark, mDir).count() === 1)
  }
}
