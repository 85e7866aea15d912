package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.flight.Flight

class FlightSpec extends SparkSpecBase {
  import spark.implicits._

  // one raw OpenSky-shaped response: 17-element positional states
  private val rawJson =
    """{"time": 1704067200, "states": [
      |["abc123", "UAL123  ", "United States", 1704067190, 1704067195, -87.9, 41.97, 3500.5, false, 250.0, 90.0, 5.2, null, 3600.0, "7700", false, 0],
      |["def456", null, "Germany", null, 1704067195, null, null, null, true, 0.0, null, null, null, null, null, false, 0],
      |["", "BAD", "Nowhere", 1, 2, 3, 4, 5, false, 6, 7, 8, null, 9, "0", false, 0],
      |["short1", "X"]
      |]}""".stripMargin.replace("\n", " ")

  private lazy val rawDir = {
    val d = Files.createTempDirectory("flight_raw")
    Files.writeString(d.resolve("batch1.json"), rawJson)
    d.toString
  }

  test("explodeStates: drops short and empty-icao24 states, names 17 fields") {
    val out = Flight.explodeStates(Flight.readRaw(spark, rawDir))
    val rows = out.orderBy("icao24").collect()
    assert(rows.length === 2) // "" icao24 and len-2 state dropped
    val r = rows.head
    assert(r.getAs[String]("icao24") === "abc123")
    assert(r.getAs[Double]("baro_altitude") === 3500.5)
    assert(r.getAs[Boolean]("on_ground") === false)
    assert(r.getAs[Int]("position_source") === 0)
  }

  test("enrich: unit conversions, truthiness nulls, presence flags, airline code") {
    val out = Flight.enrich(Flight.explodeStates(Flight.readRaw(spark, rawDir)))
      .orderBy("icao24").collect()
    val ual = out(0)
    assert(ual.getAs[Double]("baro_altitude_ft") === math.rint(3500.5 * 3.28084 * 100) / 100)
    assert(ual.getAs[Double]("velocity_knots") === math.rint(250.0 * 1.94384 * 100) / 100)
    assert(ual.getAs[String]("callsign_normalized") === "UAL123")
    assert(ual.getAs[String]("airline_code") === "UAL")
    assert(ual.getAs[Boolean]("has_position"))
    assert(ual.getAs[String]("region") === "NORTH_AMERICA")
    val ground = out(1)
    // velocity 0.0 → Python-falsy → null knots (reference quirk mirrored)
    assert(ground.isNullAt(ground.fieldIndex("velocity_knots")))
    assert(!ground.getAs[Boolean]("has_position"))
    assert(ground.getAs[String]("region") === "UNKNOWN")
  }

  // the reference's parameterized flight-phase truth table
  // (tests/unit/test_data_transformer.py:294 shape)
  private val phaseCases = Seq(
    // (alt_ft, speed_kn, climb_fpm, expected)
    (50.0, 3.0, 0.0, "GROUND"),
    (50.0, 20.0, 0.0, "TAXI"),
    (50.0, 100.0, 0.0, "TAKEOFF"),
    (2000.0, 160.0, 800.0, "TAKEOFF"),   // climbing below 3000
    (5000.0, 250.0, 800.0, "CLIMB"),
    (2000.0, 140.0, -400.0, "APPROACH"), // descending below 3000
    (20000.0, 400.0, -400.0, "DESCENT"),
    (35000.0, 450.0, 0.0, "CRUISE"),
    (5000.0, 120.0, 0.0, "APPROACH"),    // slow, mid-altitude
    (5000.0, 300.0, 0.0, "CRUISE")
  )

  test("flightPhase truth table") {
    val df = phaseCases.toDF("alt", "spd", "clm", "expected")
      .withColumn("phase", Flight.flightPhase(col("alt"), col("spd"), col("clm")))
    df.collect().foreach { r =>
      assert(r.getAs[String]("phase") === r.getAs[String]("expected"),
        s"alt=${r.getDouble(0)} spd=${r.getDouble(1)} clm=${r.getDouble(2)}")
    }
  }

  test("estimatedPhase: on_ground wins; null alt/speed unknown; bands") {
    val cases = Seq(
      (true, Some(30000.0), Some(400.0), Some(0.0), "GROUND"),
      (false, None, Some(400.0), Some(0.0), "UNKNOWN"),
      (false, Some(500.0), Some(100.0), Some(10.0), "TAKEOFF"),
      (false, Some(500.0), Some(100.0), Some(-10.0), "LANDING"),
      (false, Some(30000.0), Some(400.0), Some(0.0), "CRUISE"),
      (false, Some(10000.0), Some(250.0), Some(800.0), "CLIMB"),
      (false, Some(10000.0), Some(250.0), Some(0.0), "LEVEL_FLIGHT"))
    val df = cases.toDF("og", "alt", "spd", "vr", "expected")
      .withColumn("phase",
        Flight.estimatedPhase(col("og"), col("alt"), col("spd"), col("vr")))
    df.collect().foreach { r =>
      assert(r.getAs[String]("phase") === r.getAs[String]("expected"), r.toString)
    }
  }

  // reference quality_validator.py icao24/format truth tables (:208 shape)
  test("validity format checks: icao24, squawk, coordinates, ranges") {
    val icaoCases = Seq(
      ("abc123", true), ("ABC123", false), ("aaaaaa", true), ("12345", false),
      ("1234567", false), ("ghijkl", false), (null, false))
    val df = icaoCases.toDF("s", "expected")
      .withColumn("got", Flight.icao24Valid(col("s")))
    df.collect().foreach(r =>
      assert(r.getBoolean(2) === r.getBoolean(1), s"icao24 '${r.get(0)}'"))

    val sq = Seq(("7700", true), ("0000", true), ("7800", false), ("77", false), (null, false))
      .toDF("s", "expected").withColumn("got", Flight.squawkValid(col("s")))
    sq.collect().foreach(r =>
      assert(r.getBoolean(2) === r.getBoolean(1), s"squawk '${r.get(0)}'"))

    val coords = Seq(
      (0.0, 0.0, true), (-180.0, 90.0, true), (181.0, 0.0, false),
      (0.0, -91.0, false), (Double.NaN, 0.0, false))
      .toDF("lon", "lat", "expected")
      .withColumn("got", Flight.coordsValid(col("lon"), col("lat")))
    coords.collect().foreach(r =>
      assert(r.getBoolean(3) === r.getBoolean(2), s"coords ${r.get(0)},${r.get(1)}"))

    assert(Seq(Tuple1(60001.0)).toDF("a")
      .select(Flight.altitudeFtValid(col("a"))).head().getBoolean(0) === false)
    assert(Seq(Tuple1(-500.0)).toDF("a")
      .select(Flight.altitudeFtValid(col("a"))).head().getBoolean(0) === true)
    assert(Seq(Tuple1(801.0)).toDF("v")
      .select(Flight.velocityKnValid(col("v"))).head().getBoolean(0) === false)
    assert(Seq(Tuple1(-8001.0)).toDF("r")
      .select(Flight.verticalRateFpmValid(col("r"))).head().getBoolean(0) === false)
  }

  test("readRawWithErrors routes corrupt files to the error side channel") {
    val d = Files.createTempDirectory("flight_mixed")
    Files.writeString(d.resolve("good.json"), rawJson)
    Files.writeString(d.resolve("broken.json"), """{"time": 17, "states": [[""")
    val (good, bad) = Flight.readRawWithErrors(spark, d.toString)
    assert(good.count() === 1)
    val badRows = bad.collect()
    assert(badRows.length === 1)
    assert(badRows.head.getAs[String]("raw").contains("\"time\": 17"))
    assert(badRows.head.getAs[String]("source_file").contains("broken.json"))
  }

  test("reprocessErrors: fix-up ladder recovers fixable records, classifies dead") {
    val d = Files.createTempDirectory("flight_dlq")
    Files.writeString(d.resolve("good.json"), rawJson)
    // trailing comma before ]] — recoverable by strip_trailing_commas
    Files.writeString(d.resolve("fixable.json"),
      """{"time": 18, "states": [["aaa111", "X", "C", 1, 2, 3.0, 4.0, 5.0, false, 6.0, 7.0, 8.0, null, 9.0, "0", false, 0],]}""")
    // wrapped in log-line garbage — recoverable by extract_json_object
    Files.writeString(d.resolve("wrapped.json"),
      """WARN retry {"time": 19, "states": [["bbb222", "Y", "C", 1, 2, 3.0, 4.0, 5.0, false, 6.0, 7.0, 8.0, null, 9.0, "0", false, 0]]} end""")
    // truncated mid-array — dead
    Files.writeString(d.resolve("truncated.json"), """{"time": 20, "states": [[""")
    // not JSON at all — dead
    Files.writeString(d.resolve("garbage.json"), """not json at all""")
    val (_, bad) = Flight.readRawWithErrors(spark, d.toString)
    assert(bad.count() === 4)
    val (recovered, dead) = Flight.reprocessErrors(bad)
    val rec = recovered.orderBy("time").collect()
    assert(rec.length === 2)
    assert(rec(0).getAs[Long]("time") === 18L)
    assert(rec(0).getAs[String]("strategy") === "strip_trailing_commas")
    assert(rec(1).getAs[Long]("time") === 19L)
    assert(rec(1).getAs[String]("strategy") === "extract_json_object")
    // recovered payload is immediately explodable downstream
    val replayed = Flight.explodeStates(recovered.select("time", "states"))
    assert(replayed.count() === 2)
    val deadRows = dead.orderBy("raw").collect()
    assert(deadRows.length === 2)
    val types = deadRows.map(r =>
      r.getAs[String]("raw") -> r.getAs[String]("error_type")).toMap
    assert(types.values.toSet === Set("NOT_JSON", "TRUNCATED"))
    assert(deadRows.forall(_.getAs[Int]("attempts") === 3))
  }

  test("replayWithPolicy: flaky fix-up recovers within the attempt budget, " +
      "hopeless records dead-letter after exactly maxAttempts, cool-down " +
      "rows pass through untouched") {
    // fix-up that only works from the third attempt on (attempts >= 2)
    val flaky: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      el => el.filter(col("raw").contains("flaky") && col("attempts") >= 2)
        .select(col("raw"), col("source_file"), col("dlq_id"))
    val bad = Seq(("flaky record", "f1"), ("hopeless record", "f2"))
      .toDF("raw", "source_file")
    val policy = Flight.RetryPolicy(maxAttempts = 3, baseDelayS = 1.0,
      backoffMultiplier = 2.0, breakerFailureThreshold = 99)
    var queue = Flight.enqueueDlq(bad, nowS = 1000L)

    // run 1 @1000: both eligible, both fail → requeued attempt 1, backoff 1s
    val r1 = Flight.replayWithPolicy(queue, 1000L, policy, replay = flaky)
    assert(r1.recovered.count() === 0 && r1.dead.count() === 0)
    val q1 = r1.requeued.collect().map(r =>
      r.getAs[String]("raw") ->
        (r.getAs[Int]("attempts"), r.getAs[Long]("next_eligible_s"))).toMap
    assert(q1.values.toSet === Set((1, 1001L)))

    // run 2 @1001: both eligible again, fail → attempt 2, backoff 2s
    val r2 = Flight.replayWithPolicy(r1.requeued, 1001L, policy, replay = flaky)
    assert(r2.recovered.count() === 0 && r2.dead.count() === 0)
    assert(r2.requeued.collect().map(_.getAs[Long]("next_eligible_s")).toSet
      === Set(1003L))

    // @1002: inside the cool-down window — nothing replays, rows untouched
    val rCool = Flight.replayWithPolicy(r2.requeued, 1002L, policy, replay = flaky)
    assert(rCool.recovered.count() === 0 && rCool.dead.count() === 0)
    assert(rCool.requeued.collect().map(r =>
        (r.getAs[String]("raw"), r.getAs[Int]("attempts"),
         r.getAs[Long]("next_eligible_s"))).toSet ===
      r2.requeued.collect().map(r =>
        (r.getAs[String]("raw"), r.getAs[Int]("attempts"),
         r.getAs[Long]("next_eligible_s"))).toSet)

    // run 3 @1003: flaky succeeds (attempts=2); hopeless exhausts → dead
    val r3 = Flight.replayWithPolicy(rCool.requeued, 1003L, policy, replay = flaky)
    assert(r3.recovered.collect().map(_.getAs[String]("raw")).toSeq
      === Seq("flaky record"))
    assert(r3.requeued.count() === 0)
    val deadRows = r3.dead.collect()
    assert(deadRows.map(_.getAs[String]("raw")).toSeq === Seq("hopeless record"))
    assert(deadRows.forall(_.getAs[String]("dead_reason")
      === "max_attempts_exhausted"))
    assert(deadRows.forall(_.getAs[Int]("attempts") === 3))
  }

  test("replayWithPolicy: the circuit breaker opens on a failure burst and " +
      "skips the whole queue until its cool-down elapses") {
    val never: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      el => el.filter(lit(false))
        .select(col("raw"), col("source_file"), col("dlq_id"))
    val bad = (1 to 5).map(i => (s"rec $i", "f")).toDF("raw", "source_file")
    val policy = Flight.RetryPolicy(maxAttempts = 10,
      breakerFailureThreshold = 5, breakerCooldownS = 120L)
    val queue = Flight.enqueueDlq(bad, nowS = 1000L)
    val r1 = Flight.replayWithPolicy(queue, 1000L, policy, replay = never)
    assert(r1.breakerOpenUntilS === 1120L, "5 failures must open the breaker")
    // open breaker: everything passes through with attempts unchanged
    val r2 = Flight.replayWithPolicy(r1.requeued, 1050L, policy,
      breakerOpenUntilS = r1.breakerOpenUntilS, replay = never)
    assert(r2.recovered.count() === 0 && r2.dead.count() === 0)
    assert(r2.requeued.collect().map(_.getAs[Int]("attempts")).toSet === Set(1))
    assert(r2.breakerOpenUntilS === 1120L)
    // past the cool-down the queue replays again (attempts advance)
    val r3 = Flight.replayWithPolicy(r2.requeued, 1120L, policy, replay = never)
    assert(r3.requeued.collect().map(_.getAs[Int]("attempts")).toSet === Set(2))
  }

  test("ingest + writePartitioned round-trip with hour partitions") {
    val out = Files.createTempDirectory("flight_out").toString
    Flight.writePartitioned(Flight.ingest(spark, rawDir), out)
    val back = spark.read.parquet(out)
    assert(back.count() === 2)
    assert(back.columns.contains("hour"))
    assert(back.select("flight_phase").distinct().count() >= 1)
  }

  test("q141 flight summary: internally consistent sections (bands tile " +
      "the altitude sample, fastest ranks ordered, counts reconcile)") {
    val rows = graft.flight.Flight.q141FlightSummary(spark, Sf001).collect()
    def sec(s: String) = rows.filter(_.getAs[String]("section") == s)
    def n(s: String, item: String): Long =
      sec(s).find(_.getAs[String]("item") == item).get.getAs[Long]("n")
    val total = n("overview", "total_flights")
    assert(total === Tables.events(spark, Sf001).count())
    assert(n("overview", "flights_airborne") +
      n("overview", "flights_on_ground") === total)
    // the 4 bands tile exactly the >0-altitude sampled subset
    val bands = sec("altitude_distribution").map(_.getAs[Long]("n")).sum
    val sampledAlt = Tables.events(spark, Sf001)
      .filter(org.apache.spark.sql.functions.expr(
        "event_id % 10 = 0 AND cast(value as decimal(18,2)) * 600 > 0")).count()
    assert(bands === sampledAlt)
    // fastest: ranks 1..k, speeds non-increasing, all > 200 kn
    val fast = sec("top_fastest").sortBy(_.getAs[Long]("rank"))
    assert(fast.nonEmpty && fast.length <= 10)
    assert(fast.map(_.getAs[Long]("rank")).toSeq === (1L to fast.length).toSeq)
    val speeds = fast.map(_.getAs[Double]("v"))
    assert(speeds.zip(speeds.tail).forall { case (a, b) => a >= b })
    assert(speeds.forall(_ > 200.0))
    // countries: counts sum to total, ranks ordered by count desc
    val cs = sec("top_countries").sortBy(_.getAs[Long]("rank"))
    val cn = cs.map(_.getAs[Long]("n"))
    assert(cn.zip(cn.tail).forall { case (a, b) => a >= b })
    assert(cn.sum <= total)
  }
}
