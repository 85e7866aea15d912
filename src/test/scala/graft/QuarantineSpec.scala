package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.quality.Quarantine

/** Quarantine lifecycle state machine (quarantine_system.py semantics). */
class QuarantineSpec extends SparkSpecBase {
  import spark.implicits._

  // minimal ledger: the columns the transitions read/write
  private def mkLedger(rows: (Long, String, Double, Long, Int)*): DataFrame =
    rows.toDF("quarantine_id", "status", "quality_score", "expires_at_s",
        "recovery_attempts")
      .withColumn("raw", concat(lit("{\"id\":"), col("quarantine_id"), lit("}")))
      .withColumn("reviewer", lit(null).cast("string"))
      .withColumn("review_ts_s", lit(null).cast("long"))
      .withColumn("review_notes", lit(null).cast("string"))

  private def statusOf(df: DataFrame): Map[Long, String] =
    df.select("quarantine_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("review transitions live records and ignores decisions aimed at " +
      "terminal rows") {
    val led = mkLedger(
      (1L, "quarantined", 0.2, 100L, 0),
      (2L, "under_review", 0.4, 100L, 0),
      (3L, "rejected", 0.1, 100L, 0),     // terminal: decision must not land
      (4L, "quarantined", 0.2, 100L, 0))  // no decision: untouched
    val decisions = Seq(
      (1L, "approved_for_release", "alice", 50L, "ok"),
      (2L, "rejected", "bob", 60L, "bad"),
      (3L, "approved_for_release", "mallory", 70L, "sneaky"))
      .toDF("quarantine_id", "action", "reviewer", "review_ts_s", "review_notes")
    val out = Quarantine.applyReview(led, decisions)
    assert(statusOf(out) === Map(1L -> "approved_for_release",
      2L -> "rejected", 3L -> "rejected", 4L -> "quarantined"))
    val r1 = out.filter(col("quarantine_id") === 1).collect().head
    assert(r1.getAs[String]("reviewer") === "alice")
    assert(r1.getAs[Long]("review_ts_s") === 50L)
    // the ignored decision must not leave reviewer metadata behind
    val r3 = out.filter(col("quarantine_id") === 3).collect().head
    assert(r3.getAs[String]("reviewer") === null)
  }

  test("autoReview applies the policy projection-side but still refuses " +
      "transitions out of terminal states") {
    val led = mkLedger(
      (1L, "quarantined", 0.2, 100L, 0),
      (2L, "reprocessed", 0.2, 100L, 0),  // terminal: policy must not land
      (3L, "under_review", 0.9, 100L, 0))
    val out = Quarantine.autoReview(led,
      when(col("quality_score") >= 0.5, "approved_for_release")
        .otherwise(lit("rejected")),
      reviewer = "auto", reviewTsS = 42L, notes = "n")
    assert(statusOf(out) === Map(1L -> "rejected", 2L -> "reprocessed",
      3L -> "approved_for_release"))
    val r2 = out.filter(col("quarantine_id") === 2).collect().head
    assert(r2.getAs[String]("reviewer") === null)
  }

  test("expiry sweeps only still-quarantined records past expires_at") {
    val led = mkLedger(
      (1L, "quarantined", 0.2, 100L, 0),   // past expiry -> expired
      (2L, "quarantined", 0.2, 999L, 0),   // not yet due -> stays
      (3L, "under_review", 0.2, 100L, 0),  // reviewed rows never expire
      (4L, "reprocessed", 0.2, 100L, 0))   // terminal rows never expire
    assert(statusOf(Quarantine.expire(led, nowS = 500L)) ===
      Map(1L -> "expired", 2L -> "quarantined", 3L -> "under_review",
        4L -> "reprocessed"))
  }

  test("reprocessing routes approved rows through the replay hook: " +
      "recovered -> reprocessed, failed -> attempts bumped, exhausted -> " +
      "dead-lettered as rejected, rest untouched") {
    val led = mkLedger(
      (1L, "approved_for_release", 0.2, 999L, 0),
      (2L, "approved_for_release", 0.2, 999L, 0),
      (3L, "quarantined", 0.2, 999L, 0),
      (4L, "approved_for_release", 0.2, 999L, 3),  // already at maxAttempts
      (5L, "approved_for_release", 0.2, 999L, 2))  // last budgeted attempt
    // replay recovers only id 1 (the subset hook a real reprocessor is);
    // the hook keys on CONTENT — dlq_id is md5-derived, not the ledger id
    val out = Quarantine.reprocessApproved(led, nowS = 1000L,
      replay = df => df.filter(col("raw") === "{\"id\":1}"))
    assert(statusOf(out) === Map(1L -> "reprocessed",
      2L -> "approved_for_release", 3L -> "quarantined",
      4L -> "rejected", 5L -> "rejected"))
    val byId = out.collect().map(r =>
      r.getAs[Long]("quarantine_id") ->
        ((r.getAs[Int]("recovery_attempts"),
          r.getAs[Boolean]("recovery_successful"),
          Option(r.getAs[java.lang.Long]("last_recovery_attempt_s")),
          r.getAs[String]("dead_reason")))).toMap
    assert(byId(1L) === ((1, true, Some(1000L), null)))
    assert(byId(2L) === ((1, false, Some(1000L), null)))  // retried next run
    assert(byId(3L) === ((0, false, None, null)))  // never entered the queue
    // pre-exhausted: NOT attempted (no fictitious bump, no stamp), but
    // terminal — the reference permanently dead-letters these
    assert(byId(4L) === ((3, false, None, "max_attempts_exhausted")))
    // failed on its last budgeted attempt: bumped, stamped, dead
    assert(byId(5L) === ((3, false, Some(1000L), "max_attempts_exhausted")))
  }

  test("duplicate raw content shares one replay identity: every duplicate " +
      "resolves, the ledger never fans out") {
    // ids 1 and 2 carry IDENTICAL raw (mkLedger derives raw from the id,
    // so build rows manually), with DIFFERENT attempt counts — the replay
    // sees one content key; the ledger update must stay 1 row per id
    val led = Seq(
      (1L, "approved_for_release", 0.2, 999L, 0, "{\"id\":9}"),
      (2L, "approved_for_release", 0.2, 999L, 1, "{\"id\":9}"),
      (3L, "approved_for_release", 0.2, 999L, 0, "{\"id\":3}"))
      .toDF("quarantine_id", "status", "quality_score", "expires_at_s",
        "recovery_attempts", "raw")
      .withColumn("reviewer", lit(null).cast("string"))
      .withColumn("review_ts_s", lit(null).cast("long"))
      .withColumn("review_notes", lit(null).cast("string"))
    val out = Quarantine.reprocessApproved(led, nowS = 1000L,
      replay = df => df.filter(col("raw") === "{\"id\":9}"))
    assert(out.count() === 3) // no fan-out from the shared dlq_id
    assert(statusOf(out) === Map(1L -> "reprocessed", 2L -> "reprocessed",
      3L -> "approved_for_release"))
  }

  test("a content-keyed replay hook (the ladderReplay contract: dlq_id " +
      "recomputed from raw+source_file) still resolves recoveries") {
    val led = mkLedger((1L, "approved_for_release", 0.2, 999L, 0))
    val out = Quarantine.reprocessApproved(led, nowS = 1000L,
      replay = df => df.select(col("raw"), col("source_file"))
        .withColumn("dlq_id", graft.flight.Flight.dlqId))
    assert(statusOf(out) === Map(1L -> "reprocessed"))
  }

  test("retention purges only TERMINAL rows older than the window; live " +
      "rows never vanish") {
    val led = Seq(
      (1L, "rejected", 0L),        // terminal, ancient -> purged
      (2L, "reprocessed", 0L),     // terminal, ancient -> purged
      (3L, "expired", 900L),       // terminal, inside window -> kept
      (4L, "quarantined", 0L),     // live, ancient -> kept
      (5L, "under_review", 0L))    // live, ancient -> kept
      .toDF("quarantine_id", "status", "quarantine_ts_s")
    // cutoff = 86900 - 1 day = 500: ts 0 is past retention, ts 900 is not
    val kept = Quarantine.purgeRetention(led, nowS = 86900L, retentionDays = 1L)
      .select("quarantine_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(3L, 4L, 5L))
  }

  test("q123 lifecycle pass lands every row in a legal state with legal " +
      "reason pairing") {
    val out = Quarantine.q123QuarantineLedger(spark, Sf0001).collect()
    assert(out.nonEmpty)
    val legalStates =
      Set("quarantined", "under_review", "approved_for_release", "rejected",
        "reprocessed", "expired")
    out.foreach { r =>
      assert(legalStates.contains(r.getAs[String]("status")))
      // reprocessed rows can only come from the released low-score set
      if (r.getAs[String]("status") == "reprocessed")
        assert(r.getAs[String]("reason") === "low_quality_score")
      // under-review rows can only be salvageable critical issues
      if (r.getAs[String]("status") == "under_review")
        assert(r.getAs[String]("reason") === "critical_issue")
    }
  }
}
