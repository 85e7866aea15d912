package graft

import org.apache.spark.sql.functions._
import graft.cdc.Cdc

class CdcSpec extends SparkSpecBase {
  import spark.implicits._

  case class EvNs(event_id: Long, ts_ns: Long, user_id: Long,
                  event_type: String, value: Double)

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

  test("mergeSnapshot resolves collisions by event time, not batch recency") {
    import spark.implicits._
    // user 1's newest state (us=200) is already in the base; a LATE-ARRIVING
    // older change (us=100) lands in a newer micro-batch and must lose
    val base = Cdc.compactLog(log((2L, 200L, 1L, "click", 2.0)))
    val late = Cdc.compactLog(log((1L, 100L, 1L, "view", 1.0)))
    val merged = Cdc.mergeSnapshot(base, late)
      .select("user_id", "event_id").as[(Long, Long)].collect()
    assert(merged === Array((1L, 2L)))
  }

  test("readSnapshot ignores snapshot dirs without a _SUCCESS marker") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc-succ").toString
    Cdc.applyBatch(log((1L, 100L, 1L, "view", 1.0)), 0L, dir)
    // simulate a crash mid-write of snap=1: parquet data present, no marker
    Cdc.applyBatch(log((2L, 200L, 1L, "click", 2.0)), 1L, dir)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/snap=1/_SUCCESS"))
    val served = Cdc.readSnapshot(spark, dir).get
      .select("user_id", "event_id").as[(Long, Long)].collect()
    assert(served === Array((1L, 1L)),
      "a partially-written snapshot must not be served")
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

  test("incremental snapshot materialization equals batch compaction; replay is idempotent") {
    val e = Tables.events(spark, Sf0001)
    // three in-order micro-batches: event-time terciles of the log
    val Seq(t1, t2) = e.stat.approxQuantile("ts_ns", Array(0.33, 0.66), 0.0)
      .toSeq.map(_.toLong)
    val batches = Seq(
      e.filter(col("ts_ns") <= t1),
      e.filter(col("ts_ns") > t1 && col("ts_ns") <= t2),
      e.filter(col("ts_ns") > t2))
    val dir = java.nio.file.Files.createTempDirectory("cdc-snap").toString
    batches.zipWithIndex.foreach { case (b, i) => Cdc.applyBatch(b, i.toLong, dir) }

    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val full = keys(Cdc.compactLog(e).filter(!col("deleted")))
    assert(keys(spark.read.parquet(s"$dir/snap=2")) === full)

    // replay batch 1 (post-failure re-run): it must re-read snap=0, not
    // snap=1/2, and land byte-identical state
    val before = keys(spark.read.parquet(s"$dir/snap=1"))
    Cdc.applyBatch(batches(1), 1L, dir)
    assert(keys(spark.read.parquet(s"$dir/snap=1")) === before)
    assert(keys(Cdc.readSnapshot(spark, dir).get) === full,
      "latest snapshot must still be the batch-2 state")
  }

  test("applyCdcStream maintains the latest snapshot from a live change stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EvNs]
    val dir = java.nio.file.Files.createTempDirectory("cdc-stream").toString
    val q = Cdc.applyCdcStream(in.toDF(), s"$dir/snap", s"$dir/ckpt")
    in.addData(EvNs(1, 100000, 1, "view", 1.0), EvNs(2, 100000, 2, "click", 2.0))
    q.processAllAvailable()
    in.addData(EvNs(3, 200000, 2, "error", 0.0), // tombstone deletes user 2
               EvNs(4, 200000, 3, "signup", 3.0))
    q.processAllAvailable()
    q.stop()
    val out = Cdc.readSnapshot(spark, s"$dir/snap").get
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 1L), (3L, 4L)))
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

  test("snapshotDiff classifies added/removed/changed/unchanged and skips " +
      "never-live keys; the as-of state ignores post-cutoff records") {
    val e = log(
      // user 1: live before and after, state changed (type flip)
      (1L, 100L, 1L, "view", 1.00),
      (2L, 300L, 1L, "click", 1.00),
      // user 2: live before and after, identical newest record → unchanged
      (3L, 100L, 2L, "view", 2.00),
      // user 3: first event after cutoff → added
      (4L, 300L, 3L, "signup", 3.00),
      // user 4: live before, tombstone after → removed
      (5L, 100L, 4L, "view", 4.00),
      (6L, 300L, 4L, "error", 0.00),
      // user 5: tombstone before, live after → added (not live at cutoff)
      (7L, 100L, 5L, "error", 0.00),
      (8L, 300L, 5L, "purchase", 5.00),
      // user 6: tombstone-only history → excluded entirely
      (9L, 100L, 6L, "error", 0.00),
      // user 7: value changed at same type
      (10L, 100L, 7L, "view", 1.00),
      (11L, 300L, 7L, "view", 9.00))
    val out = Cdc.snapshotDiff(e, cutoffUs = 200L)
      .select("diff_class", "state", "n_keys", "n_type_changed",
        "sum_value_before", "sum_value_after", "net_value_delta")
      .as[(String, String, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(out === Seq(
      ("added", "purchase", 1L, 0L, 0.00, 5.00, 5.00),
      ("added", "signup", 1L, 0L, 0.00, 3.00, 3.00),
      ("changed", "click", 1L, 1L, 1.00, 1.00, 0.00),
      ("changed", "view", 1L, 0L, 1.00, 9.00, 8.00),
      ("removed", "view", 1L, 0L, 4.00, 0.00, -4.00),
      ("unchanged", "view", 1L, 0L, 2.00, 2.00, 0.00)))
  }
}
