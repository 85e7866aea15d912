package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.flight.Flight
import graft.ops.Exprs

/** Quarantine lifecycle ledger — the reference's quarantine bucket +
  * DynamoDB tracking table re-expressed as one append-only parquet relation
  * (`src/lambda/data_quality/quarantine_system.py`, 659 LoC: QuarantineRecord
  * `:87-123`, status machine `:41-49`, review `:338-381`, expiry `:489-520`,
  * recovery `:631-640`). The reference stores payloads in S3 and metadata in
  * DynamoDB; a lakehouse engine needs neither split — each ledger row carries
  * the quarantined payload (`raw`) next to its metadata, and every lifecycle
  * step is a deterministic column transform, so the whole state machine is
  * replayable and oracle-checkable.
  *
  * States (`QuarantineStatus:41-49`): quarantined → under_review →
  * approved_for_release | rejected; approved → reprocessed (via the DLQ
  * replay machinery); quarantined → expired after `AutoExpireDays` without
  * review. Terminal states (rejected / reprocessed / expired) are immutable —
  * [[applyReview]] refuses transitions out of them the way the reference's
  * conditional update only touches live records.
  *
  * Scale shape: the ledger is |quarantined| rows (a small fraction of the
  * corpus); review decisions are human-scale and ride a broadcast; expiry is
  * a pure projection; reprocessing reuses [[Flight.replayWithPolicy]]'s
  * queue contract, so backoff/breaker behavior is shared with the DLQ rather
  * than reimplemented.
  */
object Quarantine {

  /** `QuarantineConfig` defaults (`quarantine_system.py:52-85`). */
  val AutoQuarantineThreshold = 0.30
  val AutoExpireDays = 30L
  val RetentionDays = 90L

  /** Bootstrap the ledger from a validation pass: one row per quarantined
    * event (q29's routing predicate), reason per
    * `evaluate_for_quarantine:157-238` — score below the auto threshold is
    * `low_quality_score`; a critical per-field failure is `critical_issue`.
    * `nowS` is the (pinned) validation time; `expires_at_s` implements
    * `auto_expire_after_days`. */
  def ledger(spark: SparkSession, dir: String,
             nowS: Long = Quality.RefNowEpoch): DataFrame =
    ledgerFrom(Tables.events(spark, dir), nowS)

  def ledgerFrom(events: DataFrame,
                 nowS: Long = Quality.RefNowEpoch): DataFrame = {
    val scored = Quality.scoreColumns(lit(nowS))
      .foldLeft(events) { case (df, (name, c)) => df.withColumn(name, c) }
    scored.filter(col("quarantine"))
      .select(
        col("event_id").as("quarantine_id"),
        col("user_id").as("original_record_id"),
        to_json(struct(col("event_id"), col("user_id"), col("event_type"),
          col("value"))).as("raw"),
        lit(nowS).as("quarantine_ts_s"),
        when(col("quality_score") < AutoQuarantineThreshold, "low_quality_score")
          .otherwise("critical_issue").as("reason"),
        lit("quarantined").as("status"),
        col("quality_score"),
        col("quality_flags"),
        lit(nowS + AutoExpireDays * 86400L).as("expires_at_s"),
        lit(0).as("recovery_attempts"),
        lit(null).cast("string").as("reviewer"),
        lit(null).cast("long").as("review_ts_s"),
        lit(null).cast("string").as("review_notes"))
  }

  /** `review_quarantine_record:338-381`: apply a relation of review
    * decisions `(quarantine_id, action, reviewer, review_ts_s,
    * review_notes)`. A decision lands only on a LIVE record (status
    * `quarantined` or `under_review`) — decisions aimed at terminal rows are
    * ignored, mirroring the reference's update of tracked live records.
    * Decisions are human-scale by nature → broadcast; the ledger streams. */
  def applyReview(ledger: DataFrame, decisions: DataFrame): DataFrame = {
    val d = broadcast(decisions.select(
      col("quarantine_id"), col("action"),
      col("reviewer").as("d_reviewer"),
      col("review_ts_s").as("d_review_ts_s"),
      col("review_notes").as("d_review_notes")))
    ledger.join(d, Seq("quarantine_id"), "left")
      .withColumn("__legal", col("action").isNotNull &&
        col("status").isin("quarantined", "under_review"))
      .withColumn("status",
        when(col("__legal"), col("action")).otherwise(col("status")))
      .withColumn("reviewer",
        when(col("__legal"), col("d_reviewer")).otherwise(col("reviewer")))
      .withColumn("review_ts_s",
        when(col("__legal"), col("d_review_ts_s")).otherwise(col("review_ts_s")))
      .withColumn("review_notes",
        when(col("__legal"), col("d_review_notes")).otherwise(col("review_notes")))
      .drop("action", "d_reviewer", "d_review_ts_s", "d_review_notes", "__legal")
  }

  /** Policy-driven automatic review — the reference's evaluate path
    * (`evaluate_for_quarantine:157-238`) as opposed to a human reviewer:
    * when the decision is a pure function of the ledger row's own columns,
    * it rides the projection — no decisions relation, no join, nothing to
    * broadcast, so an auto-policy over a corpus-fraction ledger costs one
    * map-side pass at any scale. `action` must evaluate to a status string
    * or NULL (= no decision); the same live-records-only legality rule as
    * [[applyReview]] applies. Manual, human-scale decisions still go
    * through [[applyReview]]'s broadcast join. */
  def autoReview(ledger: DataFrame, action: org.apache.spark.sql.Column,
                 reviewer: String, reviewTsS: Long, notes: String)
      : DataFrame = {
    val legal = action.isNotNull &&
      col("status").isin("quarantined", "under_review")
    // status is rewritten LAST so every legality check reads the pre-review
    // state
    ledger
      .withColumn("reviewer",
        when(legal, lit(reviewer)).otherwise(col("reviewer")))
      .withColumn("review_ts_s",
        when(legal, lit(reviewTsS)).otherwise(col("review_ts_s")))
      .withColumn("review_notes",
        when(legal, lit(notes)).otherwise(col("review_notes")))
      .withColumn("status", when(legal, action).otherwise(col("status")))
  }

  /** `cleanup_expired_records:489-520`: ONLY still-`quarantined` records
    * past `expires_at_s` flip to `expired` (the reference's scan filters on
    * status = QUARANTINED — under-review and terminal rows never expire). */
  def expire(ledger: DataFrame, nowS: Long): DataFrame =
    ledger.withColumn("status",
      when(col("status") === "quarantined" && col("expires_at_s") < nowS,
        "expired").otherwise(col("status")))

  /** Retention sweep (`quarantine_retention_days = 90`,
    * `quarantine_system.py:70` — distinct from the 30-day review expiry):
    * TERMINAL rows (rejected / reprocessed / expired) older than the
    * retention window leave the ledger entirely, the engine-scope analog
    * of deleting the quarantine-bucket object and its tracking item. Live
    * rows are never purged, whatever their age — a record awaiting review
    * does not silently vanish. */
  def purgeRetention(ledger: DataFrame, nowS: Long,
                     retentionDays: Long = RetentionDays): DataFrame =
    ledger.filter(
      !col("status").isin("rejected", "reprocessed", "expired") ||
        col("quarantine_ts_s") >= nowS - retentionDays * 86400L)

  /** Reprocess `approved_for_release` records through the DLQ replay
    * machinery (`_trigger_recovery:631-640` at engine scope): approved rows
    * are mapped onto [[Flight.replayWithPolicy]]'s queue contract so retry
    * budgets, exponential backoff and the circuit breaker are the same
    * machinery the ingest DLQ uses.
    *
    * The queue key is the CONTENT-derived `dlq_id` the DLQ itself uses
    * (md5 of raw ⊕ source_file, [[Flight.dlqId]]), carried back to
    * `quarantine_id` through a side mapping — so both an id-preserving
    * hook and [[Flight.ladderReplay]] (which recomputes the id from
    * content) resolve recoveries to the right ledger rows. A custom
    * `replay` must preserve either `dlq_id` or (`raw`, `source_file`)
    * verbatim on the rows it returns.
    *
    * The ledger update is derived from the outcome relations themselves,
    * never from a blanket was-approved flag:
    *   - recovered → `reprocessed`, attempts+1, stamped `nowS`;
    *   - requeued  → stays `approved_for_release`, attempts/stamp only if
    *     this run actually attempted it (breaker-open and cooling-down
    *     rows pass through untouched);
    *   - dead      → terminal `rejected` with `dead_reason` — the engine
    *     analog of the reference's permanent dead-letter
    *     (`error_recovery.py:64-101`); without this, exhausted rows sat
    *     `approved_for_release` forever with a fictitious attempt count
    *     climbing each run. */
  def reprocessApproved(ledger: DataFrame, nowS: Long,
                        policy: Flight.RetryPolicy = Flight.RetryPolicy(),
                        replay: DataFrame => DataFrame = identity)
      : DataFrame = {
    val keyed = ledger.filter(col("status") === "approved_for_release")
      .select(col("quarantine_id"), col("raw"),
        lit("quarantine").as("source_file"),
        col("recovery_attempts").as("attempts"),
        lit(0L).as("next_eligible_s"))
      .withColumn("dlq_id", Flight.dlqId)
    val queue = keyed.drop("quarantine_id")
    val mapping = keyed.select(col("dlq_id"), col("quarantine_id"))
    val outcome = Flight.replayWithPolicy(queue, nowS, policy, 0L, replay)
    // no forced broadcast: the approved set is a corpus fraction, not a
    // bounded dim — AQE broadcasts these when they happen to be small
    val nullInt = lit(null).cast("int")
    val nullStr = lit(null).cast("string")
    val rec = outcome.recovered.select(col("dlq_id")).distinct()
      .join(mapping, Seq("dlq_id"))
      .select(col("quarantine_id"), lit("recovered").as("__res"),
        nullInt.as("__att"), nullStr.as("__dead_reason"))
    val dead = outcome.dead.join(mapping, Seq("dlq_id"))
      .select(col("quarantine_id"), lit("dead").as("__res"),
        col("attempts").cast("int").as("__att"),
        col("dead_reason").as("__dead_reason"))
    val requeued = outcome.requeued.join(mapping, Seq("dlq_id"))
      .select(col("quarantine_id"), lit("requeued").as("__res"),
        col("attempts").cast("int").as("__att"), nullStr.as("__dead_reason"))
    // ledger rows with IDENTICAL raw content share a content dlq_id, so
    // the mapping join can hand one quarantine_id several outcome rows
    // (even from different classes, when the duplicates carried different
    // attempt counts). Collapse to ONE update per id — recovered wins over
    // dead over requeued — so the ledger join below never fans out.
    val updates = rec.unionByName(dead).unionByName(requeued)
      .groupBy(col("quarantine_id"))
      .agg(max(struct(
        when(col("__res") === "recovered", 2)
          .when(col("__res") === "dead", 1).otherwise(0).as("__prio"),
        col("__res"), col("__att"), col("__dead_reason"))).as("u"))
      .select(col("quarantine_id"), col("u.__res").as("__res"),
        col("u.__att").as("__att"), col("u.__dead_reason").as("__dead_reason"))
    val prevLast =
      if (ledger.columns.contains("last_recovery_attempt_s"))
        col("last_recovery_attempt_s") else lit(null).cast("long")
    val prevDeadReason =
      if (ledger.columns.contains("dead_reason"))
        col("dead_reason") else nullStr
    // attempted-this-run: recovered always was; requeued/dead only when
    // the outcome's attempt counter moved past the ledger's
    val attempted = col("__res") === "recovered" ||
      (col("__res").isin("dead", "requeued") &&
        col("__att") > col("recovery_attempts"))
    ledger.join(updates, Seq("quarantine_id"), "left")
      .withColumn("__attempted", attempted)
      .withColumn("recovery_attempts",
        when(col("__res") === "recovered", col("recovery_attempts") + 1)
          .when(col("__res").isin("dead", "requeued"), col("__att"))
          .otherwise(col("recovery_attempts")))
      .withColumn("last_recovery_attempt_s",
        when(col("__attempted"), lit(nowS)).otherwise(prevLast))
      .withColumn("recovery_successful",
        coalesce(col("__res") === "recovered", lit(false)))
      .withColumn("dead_reason",
        when(col("__res") === "dead", col("__dead_reason"))
          .otherwise(prevDeadReason))
      .withColumn("status",
        when(col("__res") === "recovered", "reprocessed")
          .when(col("__res") === "dead", "rejected")
          .otherwise(col("status")))
      .drop("__res", "__att", "__dead_reason", "__attempted")
  }

  /** Deterministic planted corruption — the q100/q105 planted-harness
    * pattern applied to quality: the driver-generated events are fully
    * clean (zero nulls, zero out-of-range values — verified at every SF),
    * so the lifecycle would be vacuous without planted dirt. Rules are pure
    * functions of `event_id` with NESTED moduli (17 | 34 | 51 | 68), so
    * single and compound failures both occur and DuckDB replants
    * identically. */
  def plantCorruption(e: DataFrame): DataFrame = e
    .withColumn("value",
      when(col("event_id") % 17 === 0, lit(null).cast("double"))
        .otherwise(col("value")))
    .withColumn("user_id",
      when(col("event_id") % 34 === 0, lit(null).cast("long"))
        .otherwise(col("user_id")))
    .withColumn("event_type",
      when(col("event_id") % 51 === 0, lit("bogus"))
        .otherwise(col("event_type")))
    .withColumn("props",
      when(col("event_id") % 68 === 0, lit(null).cast("string"))
        .otherwise(col("props")))

  /** q123: the whole lifecycle as one deterministic, oracle-checked pass
    * over the planted-corruption corpus — bootstrap at the pinned
    * validation time, an automatic review policy (low-score records with a
    * salvageable score ≥ 0.25 are released, hopeless ones rejected;
    * critical-issue records scoring ≥ 0.5 wait for manual review, the rest
    * are left alone), identity-replay reprocessing of the released set, and
    * the 31-day expiry sweep over whatever was never reviewed. Rolled up by
    * (status, reason). Every transition is a CASE over (reason,
    * quality_score) and quality_score is bitwise identical across engines
    * (q28's hash-green proves it), so DuckDB replays the state machine
    * exactly. Thresholds 0.25 / 0.5 are dyadic (CLAUDE.md rule). */
  def q123QuarantineLedger(spark: SparkSession, dir: String): DataFrame = {
    // persist the bootstrap: the ledger is |quarantined| rows (~N/17 on the
    // planted corpus) but its lineage is the full scoring scan, and the
    // lifecycle replays that lineage 4x otherwise (decisions derivation,
    // replay-queue build, the replay outcome count, the final join)
    val led = ledgerFrom(plantCorruption(Tables.events(spark, dir))).persist()
    // the policy is a pure function of (reason, quality_score) -> autoReview
    // (projection, joinless); a human decisions relation would use
    // applyReview's broadcast join instead
    val policy =
      when(col("reason") === "low_quality_score",
        when(col("quality_score") >= 0.25, "approved_for_release")
          .otherwise("rejected"))
        .otherwise(when(col("quality_score") >= 0.5, "under_review"))
    val reviewed = autoReview(led, policy, reviewer = "auto-reviewer",
      reviewTsS = Quality.RefNowEpoch + 7L * 86400L, notes = "policy pass")
    val reprocessed = reprocessApproved(reviewed,
      nowS = Quality.RefNowEpoch + 8L * 86400L)
    expire(reprocessed, nowS = Quality.RefNowEpoch + 31L * 86400L)
      .groupBy(col("status"), col("reason")).agg(
        count(lit(1)).as("n"),
        Exprs.dround(Exprs.sumExact(col("quality_score"), 6) / count(lit(1)), 6)
          .as("avg_score"))
      .orderBy(col("status"), col("reason"))
  }

  val oracle: Map[String, String] = Map(
    "q123_quarantine_ledger" ->
      s"""WITH dirty AS (
        |  SELECT * REPLACE (
        |    CASE WHEN event_id % 17 = 0 THEN NULL ELSE value END AS value,
        |    CASE WHEN event_id % 34 = 0 THEN NULL ELSE user_id END AS user_id,
        |    CASE WHEN event_id % 51 = 0 THEN 'bogus' ELSE event_type END
        |      AS event_type,
        |    CASE WHEN event_id % 68 = 0 THEN NULL ELSE props END AS props)
        |  FROM events),
        |${Quality.scoreCte(from = "dirty")},
        |led AS (
        |  SELECT event_id AS quarantine_id, quality_score,
        |    CASE WHEN quality_score < 0.30 THEN 'low_quality_score'
        |         ELSE 'critical_issue' END AS reason
        |  FROM scored
        |  WHERE quality_score < 0.30 OR invalid_core),
        |-- the state machine collapses to one CASE because the transitions
        |-- are deterministic: low-score >= 0.25 is approved then recovered
        |-- by the identity replay (-> reprocessed), below that rejected;
        |-- critical >= 0.5 waits under review (never expires); everything
        |-- else is never reviewed and expires at the 31-day sweep
        |final AS (
        |  SELECT *,
        |    CASE WHEN reason = 'low_quality_score' AND quality_score >= 0.25
        |           THEN 'reprocessed'
        |         WHEN reason = 'low_quality_score' THEN 'rejected'
        |         WHEN quality_score >= 0.5 THEN 'under_review'
        |         ELSE 'expired' END AS status
        |  FROM led)
        |SELECT status, reason, count(*) AS n,
        |  round(sum(quality_score::DECIMAL(25,6))::DOUBLE / count(*), 6)
        |    AS avg_score
        |FROM final GROUP BY status, reason ORDER BY status, reason""".stripMargin)
}
