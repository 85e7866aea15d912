package graft

import org.apache.spark.sql.functions._
import graft.analytics.Trends

class TrendsSpec extends SparkSpecBase {
  import spark.implicits._

  // (event_id, day, user_id) → events.parquet with one row per tuple,
  // value fixed — enough surface for the daily-grain drift/trend math
  private def eventsDir(rows: (Long, Long, Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("trends").toString
    rows.toDF("event_id", "day", "user_id", "event_type")
      .select(col("event_id"), (col("day") * 86400000000000L + col("event_id")).as("ts"),
        col("user_id"), col("event_type"), lit(10.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q92 flags a ±20% day-over-day volume break, integer-banded") {
    // day 0: 10 events; day 1: 10 (stable); day 2: 13 (+30% → flag)
    val rows = (1L to 10L).map(i => (i, 0L, i, "view")) ++
      (11L to 20L).map(i => (i, 1L, i, "view")) ++
      (21L to 33L).map(i => (i, 2L, i, "view"))
    val r = Trends.q92DriftMonitor(spark, eventsDir(rows: _*))
      .orderBy("day").collect()
    assert(r.length === 3)
    assert(!r(0).getAs[Boolean]("flag_volume")) // no previous day
    assert(!r(1).getAs[Boolean]("flag_volume")) // 10 vs 10
    assert(r(2).getAs[Boolean]("flag_volume"))  // 13 vs 10 → 5·13 > 6·10
    assert(r(2).getAs[Double]("vol_change_pct") === 30.0)
  }

  test("q93 recovers an exact linear trend: slope, intercept, r = 1") {
    // type "lin": day d has 3 + 2d events (d = 0..4)
    val rows = for {
      d <- 0L to 4L
      i <- 1L to (3 + 2 * d)
    } yield (d * 100 + i, d, i, "lin")
    val r = Trends.q93TrendSlope(spark, eventsDir(rows: _*)).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Double]("slope") === 2.0)
    assert(r.head.getAs[Double]("intercept") === 3.0)
    assert(r.head.getAs[Double]("r") === 1.0)
  }

  test("q92/q93 run on the driver tables with sane shapes") {
    val drift = Trends.q92DriftMonitor(spark, Sf0001).collect()
    assert(drift.length > 1)
    assert(drift.map(_.getAs[Long]("day")).distinct.length === drift.length)
    val trend = Trends.q93TrendSlope(spark, Sf0001).collect()
    assert(trend.nonEmpty)
    trend.foreach { t =>
      val r = t.getAs[Double]("r")
      assert(!r.isNaN && math.abs(r) <= 1.0 + 1e-6)
    }
  }
  test("q98 flags a planted hot key via the integer band") {
    // type "hot": one key with 40 rows, 9 keys with 1 -> max*keys = 400 > 4*49
    // type "flat": 10 keys x 2 rows -> max*keys = 20 < 4*20
    val rows =
      (1L to 40L).map(i => (i, 0L, 999L, "hot")) ++
      (41L to 49L).map(i => (i, 0L, i, "hot")) ++
      (50L to 69L).map(i => (i, 0L, 100 + i % 10, "flat"))
    val out = Trends.q98KeySkew(spark, eventsDir(rows: _*)).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("hot").getAs[Boolean]("needs_salting"))
    assert(!out("flat").getAs[Boolean]("needs_salting"))
    assert(out("hot").getAs[Long]("max_n") === 40L)
    assert(out("flat").getAs[Double]("skew_factor") === 1.0)
  }

}
