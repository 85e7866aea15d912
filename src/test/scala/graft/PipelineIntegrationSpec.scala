package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.flight.Flight
import graft.functions.HistogramAgg

/** End-to-end integration (SURVEY §5 integration tier): raw landing JSON →
  * explode/validate → enrich/categorize → partitioned parquet → read back →
  * aggregate, with the corrupt-file side channel exercised in the same run. */
class PipelineIntegrationSpec extends SparkSpecBase {
  import spark.implicits._

  test("raw JSON to partitioned parquet to analytics round-trip") {
    val landing = Files.createTempDirectory("e2e_landing")
    // two good batches (different hours) + one corrupt file
    def state(icao: String, alt: Double, vel: Double, ground: Boolean) =
      s"""["$icao", "CS$icao ", "US", 1, 2, -100.0, 40.0, $alt, $ground, $vel, 90.0, 1.0, null, $alt, "7000", false, 0]"""
    Files.writeString(landing.resolve("b1.json"),
      s"""{"time": 1704067200, "states": [${state("aaa111", 3000.0, 250.0, false)}, ${state("bbb222", 0.0, 2.0, true)}]}""")
    Files.writeString(landing.resolve("b2.json"),
      s"""{"time": 1704070800, "states": [${state("ccc333", 11000.0, 240.0, false)}]}""")
    Files.writeString(landing.resolve("broken.json"), """{"time": 99, "states": [[""")

    val (good, bad) = Flight.readRawWithErrors(spark, landing.toString)
    assert(bad.count() === 1)

    val enriched = Flight.ingest(spark, landing.toString)
    val out = Files.createTempDirectory("e2e_out").toString
    Flight.writePartitioned(enriched, out)

    val back = spark.read.parquet(out)
    assert(back.count() === 3)
    assert(back.select("hour").distinct().count() === 2) // two hourly partitions
    val phases = back.select("icao24", "flight_phase").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(phases("bbb222") === "GROUND") // on ground, slow
    // aaa111: 3000 m ≈ 9842 ft, 250 m/s ≈ 486 kn, no climb → cruise band
    assert(phases("aaa111") === "CRUISE")
    // analytics over the landed data: category distribution
    val cats = back.groupBy("altitude_category").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cats.values.sum === 3)
  }

  test("typed HistogramAgg matches the DataFrame histogram on events.value") {
    val values = Tables.events(spark, Sf0001).select(col("value")).as[Double]
    val hist = values.select(HistogramAgg(0.0, 100.0, 10).toColumn).head()
    val viaDf = Tables.events(spark, Sf0001)
      .groupBy(floor(col("value") / 10).cast("int").as("b")).count()
      .collect().map(r => math.min(math.max(r.getInt(0), 0), 9) -> r.getLong(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(hist === viaDf)
  }

  test("validated stream -> quarantine lifecycle -> metrics ledger -> " +
      "live alert suppression composes end-to-end") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streaming
    import graft.quality.{Metrics, Quarantine}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(t: String) = java.sql.Timestamp.valueOf(t)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val out = Files.createTempDirectory("pipe_out").toString
    val qDir = Files.createTempDirectory("pipe_q").toString
    val mDir = Files.createTempDirectory("pipe_m").toString

    // 1) two micro-batches through the validated sink, each bad enough
    // that the streaming check suite alerts (validity 1 − 4/6 = 0.333,
    // overall (1 + 0.333 + 1)/3 ≈ 0.778 < 0.8)
    Streaming.writeValidatedBatch(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 10:01:00"), 2L, "bogus", -5.0),
      (3L, ts("2024-01-01 10:02:00"), 3L, "bogus", -7.0)).toDF(cols: _*),
      0L, out, qDir, mDir)
    Streaming.writeValidatedBatch(Seq(
      (4L, ts("2024-01-01 11:00:00"), 4L, "bogus", 2.0),
      (5L, ts("2024-01-01 11:01:00"), 5L, "bogus", -1.0),
      (6L, ts("2024-01-01 11:02:00"), 6L, "error", 9999.0)).toDF(cols: _*),
      1L, out, qDir, mDir)
    assert(spark.read.parquet(out).count() === 1)

    // 2) the quarantine sink rows bootstrap the batch-side lifecycle:
    // approve everything, identity-replay — all rows end reprocessed
    val led = spark.read.parquet(qDir)
      .select(col("event_id").as("quarantine_id"),
        to_json(struct(col("event_id"), col("event_type"), col("value")))
          .as("raw"),
        col("status"), lit(0.2).as("quality_score"),
        lit(9999999999L).as("expires_at_s"), lit(0).as("recovery_attempts"),
        lit(null).cast("string").as("reviewer"),
        lit(null).cast("long").as("review_ts_s"),
        lit(null).cast("string").as("review_notes"))
    assert(led.count() === 5)
    val reviewed = Quarantine.autoReview(led, lit("approved_for_release"),
      reviewer = "ops", reviewTsS = 100L, notes = "bulk release")
    val done = Quarantine.reprocessApproved(reviewed, nowS = 200L)
    assert(done.filter(col("status") === "reprocessed").count() === 5)

    // 3) the metrics ledger drives alerting: both batch rows alerted...
    val m = Metrics.readMetrics(spark, mDir)
      .filter(col("quality_alert")).orderBy(col("run_id")).collect()
    assert(m.length === 2)
    // ...and the LIVE suppressor emits the first, suppresses the second
    // (batches an hour apart, 2h window) reporting it on the next emit
    val alerts = m.zipWithIndex.map { case (r, i) =>
      Streaming.AlertIn("hourly_quality", "stream",
        r.getAs[String]("alert_severity"), i * 3600L)
    }
    val in = MemoryStream[Streaming.AlertIn]
    val q = Streaming.suppressAlertsStream(in.toDS(), windowS = 7200L,
        idleTimeout = None)
      .writeStream.format("memory").queryName("pipe_alerts")
      .outputMode("append").start()
    in.addData(alerts.toIndexedSeq: _*)
    q.processAllAvailable()
    val decisions = spark.sql(
        "select tsS, emitted from pipe_alerts order by tsS").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    q.stop()
    assert(decisions.toSeq === Seq((0L, true), (3600L, false)))
  }
}
