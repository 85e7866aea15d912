package graft

import org.apache.spark.sql.functions._
import graft.cdc.Cdc

class CdcSpec extends SparkSpecBase {
  import spark.implicits._

  // (event_id, us, user_id, event_type, value) → events-shaped frame
  private def log(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts_ns", col("us") * 1000)
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")

  test("compactLog keeps exactly the newest record per key; ties break on event_id") {
    val e = log(
      (1L, 100L, 1L, "view", 1.0),
      (2L, 200L, 1L, "click", 2.0),   // newest for user 1
      (3L, 100L, 2L, "view", 3.0),
      (4L, 100L, 2L, "purchase", 4.0) // same us → higher event_id wins
    )
    val out = Cdc.compactLog(e).select("user_id", "event_id", "deleted")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out === Array((1L, 2L, false), (2L, 4L, false)))
  }

  test("tombstones mark deleted; mergeSnapshot drops them and lets changes win") {
    val base = Cdc.compactLog(log(
      (1L, 100L, 1L, "view", 1.0),
      (2L, 100L, 2L, "click", 2.0),
      (3L, 100L, 3L, "error", 3.0))) // user 3 already deleted in base
    val changes = Cdc.compactLog(log(
      (4L, 200L, 2L, "error", 4.0),  // delete user 2
      (5L, 200L, 4L, "signup", 5.0)) // insert user 4
    )
    val merged = Cdc.mergeSnapshot(base, changes)
      .select("user_id", "event_id").as[(Long, Long)].collect().sortBy(_._1)
    // user 1 untouched, user 2 deleted by change, user 3 deleted in base,
    // user 4 inserted
    assert(merged === Array((1L, 1L), (4L, 5L)))
  }

  test("incremental merge equals full-log compaction at any split point") {
    val e = Tables.events(spark, Sf0001)
    val full = Cdc.compactLog(e).filter(!col("deleted"))
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    // split on median event time: base = older half, changes = newer half
    val cut = e.agg(expr("percentile(ts_ns div 1000, 0.5)")).first().getDouble(0).toLong
    val base = Cdc.compactLog(e.filter(expr(s"ts_ns div 1000 <= $cut")))
    val changes = Cdc.compactLog(e.filter(expr(s"ts_ns div 1000 > $cut")))
    val merged = Cdc.mergeSnapshot(base, changes)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(merged === full)
  }

  test("scd2 versions run-length encode the state stream") {
    val e = log(
      (1L, 100L, 1L, "view", 0.0),
      (2L, 200L, 1L, "view", 0.0),
      (3L, 300L, 1L, "click", 0.0),
      (4L, 400L, 1L, "view", 0.0), // returning to a prior state opens a NEW version
      (5L, 100L, 2L, "signup", 0.0))
    // run the real query over a parquet round-trip; Tables.events reads the
    // ts column as epoch-nanos (the driver tables carry TIMESTAMP(NANOS),
    // which the nanosAsLong conf surfaces as long — a plain BIGINT matches)
    val dir = java.nio.file.Files.createTempDirectory("cdc-scd2").toString
    e.select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Cdc.q81Scd2History(spark, dir)
      .select("user_id", "n_versions", "n_events", "max_version_events",
        "current_state", "current_since_us", "closed_dur_us")
      .as[(Long, Long, Long, Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 3L, 4L, 2L, "view", 400L, 300L)))
    assert(out(1) === ((2L, 1L, 1L, 1L, "signup", 100L, 0L)))
  }
}
