package graft

import org.apache.spark.sql.functions._
import graft.analytics.Behavior

class BehaviorSpec extends SparkSpecBase {
  import spark.implicits._

  // (event_id, us, user_id, event_type) → events.parquet round trip (the
  // driver tables carry TIMESTAMP(NANOS) read as long; a BIGINT ts matches)
  private def eventsDir(rows: (Long, Long, Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("behavior").toString
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), (col("us") * 1000).as("ts"), col("user_id"),
        col("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel requires strict step order; latencies average first-touch gaps") {
    val dir = eventsDir(
      (1L, 100L, 1L, "view"), (2L, 200L, 1L, "click"), (3L, 300L, 1L, "purchase"),
      (4L, 100L, 2L, "click"), (5L, 200L, 2L, "view"),      // click BEFORE view
      (6L, 100L, 3L, "view"), (7L, 200L, 3L, "purchase"),   // skips click
      (8L, 100L, 4L, "click"))                              // never views
    val r = Behavior.q86Funnel(spark, dir).collect().head
    assert(r.getAs[Long]("n_view") === 3)        // users 1, 2, 3
    assert(r.getAs[Long]("n_click") === 1)       // only user 1
    assert(r.getAs[Long]("n_purchase") === 1)    // purchase needs a click first
    assert(r.getAs[Double]("avg_click_lat_us") === 100.0)
    assert(r.getAs[Double]("avg_purchase_lat_us") === 100.0)
    assert(r.getAs[Double]("click_pct") === 33.33)
  }

  test("retention counts distinct users per cohort day-offset") {
    val day = 86400000000L
    val dir = eventsDir(
      (1L, 100L, 1L, "view"), (2L, day + 5, 1L, "view"),
      (3L, 3 * day + 5, 1L, "view"), (4L, 3 * day + 9, 1L, "view"), // same day twice
      (5L, 200L, 2L, "view"),
      (6L, day + 7, 3L, "view"))
    val out = Behavior.q87Retention(spark, dir)
      .select("cohort", "offset", "n_active", "cohort_size", "retention_pct")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (0L, 0L, 2L, 2L, 100.0),  // users 1, 2 first seen day 0
      (0L, 1L, 1L, 2L, 50.0),   // user 1 returns day 1
      (0L, 3L, 1L, 2L, 50.0),   // user 1 returns day 3 (deduped within day)
      (1L, 0L, 1L, 1L, 100.0))) // user 3's own cohort
  }

  test("transition matrix row-normalizes successor counts per user timeline") {
    val dir = eventsDir(
      (1L, 100L, 1L, "view"), (2L, 200L, 1L, "click"), (3L, 300L, 1L, "view"),
      (4L, 100L, 2L, "view"), (5L, 200L, 2L, "view"))
    val out = Behavior.q88Transitions(spark, dir)
      .select("from_type", "to_type", "n", "pct")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("click", "view", 1L, 100.0),
      ("view", "click", 1L, 50.0),
      ("view", "view", 1L, 50.0)))
  }
  test("q99 lift separates co-traveling types from independent ones") {
    // users 1-4: view+click always together (lift > 1 vs type-independence);
    // purchase only for user 1
    val dir = eventsDir(
      (1L, 100L, 1L, "view"), (2L, 200L, 1L, "click"), (3L, 300L, 1L, "purchase"),
      (4L, 100L, 2L, "view"), (5L, 200L, 2L, "click"),
      (6L, 100L, 3L, "view"), (7L, 200L, 3L, "click"),
      (8L, 100L, 4L, "view"), (9L, 200L, 4L, "click"))
    val out = Behavior.q99CooccurrenceLift(spark, dir).collect()
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2")) -> r).toMap
    val vc = out(("click", "view"))
    assert(vc.getAs[Long]("n_both") === 4L)
    assert(vc.getAs[Double]("lift") === 1.0)    // both have all 4 users
    assert(vc.getAs[Double]("support_pct") === 100.0)
    val cp = out(("click", "purchase"))
    assert(cp.getAs[Long]("n_both") === 1L)     // only user 1
    assert(cp.getAs[Double]("lift") === 1.0)    // 1*4 / (4*1)
  }

}
