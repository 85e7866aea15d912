package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exprs

/** Change-data-capture semantics over an append-only event log: last-wins
  * upsert compaction with tombstones (the MERGE INTO apply step every
  * lakehouse table maintenance job runs) and SCD2 dimension-history build
  * (effective ranges from a change stream).
  *
  * The reference materializes its "latest state" table by rewriting a full
  * snapshot per batch (`src/lambda/etl/flight_data_processor.py` latest-
  * snapshot sink; see `Sources.writeLatestSnapshot`); these operators are the
  * incremental formulation of the same contract: the state a key holds is
  * decided by the newest change record, deletes remove the key.
  *
  * Scale notes:
  *   - Compaction is one shuffle on the key; the top-1-per-key window
  *     becomes partial+final `WindowGroupLimit`, so each map task forwards
  *     at most one row per key — shuffle volume is bounded by |keys|, not
  *     |log|. At 100 TB the log arrives hour-partitioned (S5 sink), so the
  *     incremental run compacts only new partitions and merges against the
  *     previous snapshot ([[mergeSnapshot]]) — never re-reads the full log.
  *   - SCD2 runs entirely inside one `user_id` hash partition: change
  *     detection (lag), version numbering (running sum), version ranges and
  *     the final rollup all reuse the same partitioning — one exchange total.
  */
object Cdc {

  /** Event-time ordering for change records: micros + id tiebreak
    * (CLAUDE.md ordered-window rule). */
  private val orderCols: Seq[Column] =
    Seq(expr("ts_ns div 1000"), col("event_id"))

  /** Last-wins compaction: the newest change record per key, with
    * `deleted` flagging tombstones (`event_type = 'error'` stands in for
    * the CDC delete op in the synthetic log). Downstream either filters
    * `!deleted` (serving) or keeps the tombstone (incremental merge input —
    * a delete must survive to cancel older upserts in the base). */
  def compactLog(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(orderCols.map(_.desc): _*)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .withColumn("deleted", col("event_type") === "error")
  }

  /** Incremental MERGE: apply a compacted change-batch to a previous
    * compacted snapshot. Collisions resolve by EVENT TIME (micros + id
    * tiebreak), with batch recency (`__pri`) only as the final tiebreak —
    * so a late-arriving older change in a newer micro-batch cannot
    * overwrite newer state, and correctness does not depend on the poller
    * delivering batches in event-time order. Tombstone rows drop the key.
    * Equivalent to `MERGE INTO base USING changes WHEN MATCHED [AND
    * deleted] THEN DELETE/UPDATE WHEN NOT MATCHED [AND NOT deleted] THEN
    * INSERT`, expressed as union + keep-newest — both sides are
    * |keys|-sized, so the one shuffle moves snapshot-sized data, and the
    * same `WindowGroupLimit` partial/final split as [[compactLog]] applies. */
  def mergeSnapshot(base: DataFrame, changes: DataFrame): DataFrame = {
    val u = base.withColumn("__pri", lit(0))
      .unionByName(changes.withColumn("__pri", lit(1)))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(orderCols.map(_.desc) :+ col("__pri").desc: _*)
    u.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__pri")
      .filter(!col("deleted"))
  }

  /** q80: CDC upsert compaction report — final per-key state of the event
    * log under last-wins + tombstone semantics, rolled up by the state the
    * key ended in. `deleted` keys are reported (their value sums audit the
    * tombstone channel), live keys carry the surviving state. */
  def q80CdcUpsert(spark: SparkSession, dir: String): DataFrame =
    compactLog(Tables.events(spark, dir))
      .withColumn("state",
        when(col("deleted"), lit("deleted")).otherwise(lit("live")))
      .groupBy(col("state"), col("event_type")).agg(
        count(lit(1)).as("n_keys"),
        Exprs.sumExact2(col("value")).as("sum_value"),
        max(expr("ts_ns div 1000")).as("latest_us"))
      .orderBy(col("event_type"))

  /** q81: SCD2 history build — run-length encode each key's `event_type`
    * stream into effective-dated versions (a new version opens when the
    * attribute changes; `effective_to` = next version's open, NULL = the
    * current version). Output is the per-key shape of the resulting
    * dimension: version count, the current state and when it opened, the
    * largest version's row count, and the total closed-version dwell time —
    * integer micros throughout, so the oracle comparison is exact. */
  def q81Scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(orderCols: _*)
    val run = Window.partitionBy(col("user_id")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val versioned = Tables.events(spark, dir)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(run))
    val versions = versioned.groupBy(col("user_id"), col("version")).agg(
      min(expr("ts_ns div 1000")).as("from_us"),
      min(col("event_type")).as("state"), // constant within a version
      count(lit(1)).as("n_rows"))
    val wv = Window.partitionBy(col("user_id")).orderBy(col("version"))
    versions
      .withColumn("to_us", lead(col("from_us"), 1).over(wv))
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("n_versions"),
        sum(col("n_rows")).as("n_events"),
        max(col("n_rows")).as("max_version_events"),
        max_by(col("state"), col("version")).as("current_state"),
        max(col("from_us")).as("current_since_us"),
        coalesce(sum(when(col("to_us").isNotNull, col("to_us") - col("from_us"))),
          lit(0L)).as("closed_dur_us"))
      .orderBy(col("user_id"))
  }

  /** q110 diff cutoff: 2024-01-01 06:00:00 UTC in micros — early enough
    * that a minority of keys exist in the "before" snapshot, so every diff
    * class (added/removed/changed/unchanged) is populated at every SF. */
  val DiffCutoffUs = 1704088800000000L

  /** Snapshot-diff audit between two points of the change log: the state
    * every key held at [[DiffCutoffUs]] vs its final state, classified as
    * added / removed / changed / unchanged — the table-maintenance audit a
    * lakehouse runs after a MERGE window ("what did this batch range do to
    * the table"). Keys that were never live on either side (tombstone-only
    * histories) are excluded.
    *
    * Scale shape: ONE hash aggregation over the log — both endpoint states
    * come out of the same `max_by` pass (the "as of cutoff" state is a
    * `max_by` over a key made null past the cutoff; MaxBy skips null
    * ordering keys), so there is no second scan, no window, and no
    * snapshot-vs-snapshot join: shuffle volume is |keys|, with map-side
    * partial aggregation. The classifier and value deltas are plain
    * projections on the |keys|-sized result. Value sums ride the exact
    * decimal rule (events.value is exactly 2 dp) so partition order can't
    * flip a rounded digit.
    *
    * Reference anchor: the latest-snapshot sink this diffs is
    * `src/lambda/etl/flight_data_processor.py`'s per-batch snapshot
    * rewrite (see [[mergeSnapshot]]); the audit itself has no reference
    * counterpart — it is the operational check that makes incremental
    * snapshots trustworthy.
    */
  def snapshotDiff(events: DataFrame, cutoffUs: Long): DataFrame = {
    val us = expr("ts_ns div 1000")
    val ord = struct(us, col("event_id"))
    val state = struct(col("event_type"), col("value"))
    val per = events.groupBy(col("user_id")).agg(
      max_by(state, ord).as("cur"),
      max_by(state, when(us <= lit(cutoffUs), ord)).as("old"))
    val oldLive = col("old").isNotNull && col("old.event_type") =!= "error"
    val curLive = col("cur.event_type") =!= "error"
    val differs = col("old.event_type") =!= col("cur.event_type") ||
      !(col("old.value") <=> col("cur.value"))
    per
      .withColumn("diff_class",
        when(!oldLive && curLive, lit("added"))
          .when(oldLive && !curLive, lit("removed"))
          .when(oldLive && curLive && differs, lit("changed"))
          .when(oldLive && curLive, lit("unchanged")))
      .filter(col("diff_class").isNotNull)
      .withColumn("state",
        when(col("diff_class") === "removed", col("old.event_type"))
          .otherwise(col("cur.event_type")))
      .groupBy(col("diff_class"), col("state")).agg(
        count(lit(1)).as("n_keys"),
        count(when(col("diff_class") === "changed" &&
          col("old.event_type") =!= col("cur.event_type"), 1)).as("n_type_changed"),
        coalesce(Exprs.sumExact2(when(oldLive, col("old.value"))), lit(0.0))
          .as("sum_value_before"),
        coalesce(Exprs.sumExact2(when(curLive, col("cur.value"))), lit(0.0))
          .as("sum_value_after"))
      .withColumn("net_value_delta",
        Exprs.dround(col("sum_value_after") - col("sum_value_before"), 2))
      .orderBy(col("diff_class"), col("state"))
  }

  /** q110: snapshot-diff audit of the event log at the pinned cutoff. */
  def q110SnapshotDiff(spark: SparkSession, dir: String): DataFrame =
    snapshotDiff(Tables.events(spark, dir), DiffCutoffUs)

  /** Committed snapshot version ids present under `dir` (subdirs
    * `snap=<batchId>` carrying a `_SUCCESS` marker). Enumerated through the
    * Hadoop FileSystem API — snapshots are written by Spark's Hadoop FS
    * writers, so `java.io.File` would see nothing on HDFS/S3 and every
    * batch would silently restart from empty state. A dir without
    * `_SUCCESS` is a crash-orphaned partial write (directory overwrite is
    * not atomic); skipping it means a crashed batch N is invisible until
    * replayed, never served corrupt. */
  private def snapshotIds(spark: SparkSession, dir: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) Nil
    else fs.listStatus(path).toSeq
      .filter(s => s.isDirectory &&
        fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("snap=") => s.stripPrefix("snap=").toLong }
  }

  /** Latest committed snapshot, optionally restricted to versions
    * strictly BEFORE `before` — the restriction is what makes batch replay
    * safe (see [[applyBatch]]). */
  def readSnapshot(spark: SparkSession, dir: String,
                   before: Option[Long] = None): Option[DataFrame] = {
    val ids = snapshotIds(spark, dir).filter(id => before.forall(id < _))
    if (ids.isEmpty) None
    else Some(spark.read.parquet(s"$dir/snap=${ids.max}"))
  }

  /** foreachBatch body of the incremental snapshot pipeline, exposed for
    * direct testing (the [[graft.streaming.Streaming.writeBatch]]
    * precedent). Applies micro-batch `batchId` to the newest snapshot with
    * a version id strictly below it and writes `snap=<batchId>`.
    *
    * Replay-safe: a re-run of batch N re-reads the snapshot at N−1 — never
    * the partially/fully written snapshot N — so the rewrite is a pure
    * function of (snapshot N−1, batch N) and `mode("overwrite")` lands the
    * identical result. Snapshot versions accumulate one dir per batch;
    * production would retire versions older than the checkpoint horizon
    * (the [[graft.sources.Sources.compact]] atomic-swap machinery) and
    * track them in a transaction log rather than by directory listing. */
  def applyBatch(batch: DataFrame, batchId: Long, dir: String): Unit = {
    val changes = compactLog(batch)
    val merged = readSnapshot(batch.sparkSession, dir, Some(batchId)) match {
      case Some(prev) => mergeSnapshot(prev, changes)
      case None       => changes.filter(!col("deleted"))
    }
    merged.write.mode("overwrite").parquet(s"$dir/snap=$batchId")
  }

  /** Streaming incremental MERGE: continuously maintain the latest-state
    * snapshot from a change stream — the streaming formulation of the
    * reference's per-batch full-snapshot rewrite (latest-snapshot sink),
    * shuffling only |changed keys| + |snapshot| per batch instead of
    * re-reading the full log. Contract: micro-batches partition event time
    * in order (the file-source poller's property), so batch priority in
    * [[mergeSnapshot]] agrees with event-time order. */
  def applyCdcStream(events: DataFrame, snapDir: String,
                     checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => applyBatch(b, id, snapDir))
      .start()

  val oracle: Map[String, String] = Map(
    // Same last-wins ranking as q80, evaluated at two points of the log in
    // two CTEs (the Spark side fuses both into one max_by pass — the oracle
    // only needs to be correct). old keys ⊆ cur keys, so LEFT JOIN from cur
    // is a full diff. Value compare is raw parquet doubles (no arithmetic)
    // → IS DISTINCT FROM is exact; sums ride the decimal rule; the net
    // delta subtracts the same two decimal-backed doubles both engines
    // hold bit-identically.
    "q110_snapshot_diff" ->
      """WITH cur AS (
        |  SELECT user_id, event_type, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |    FROM events) WHERE rn = 1),
        |old AS (
        |  SELECT user_id, event_type, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |    FROM events WHERE epoch_us(ts) <= 1704088800000000) WHERE rn = 1),
        |j AS (
        |  SELECT c.user_id,
        |    o.event_type IS NOT NULL AND o.event_type <> 'error' AS old_live,
        |    c.event_type <> 'error' AS cur_live,
        |    o.event_type AS old_type, o.value AS old_value,
        |    c.event_type AS cur_type, c.value AS cur_value
        |  FROM cur c LEFT JOIN old o USING (user_id)),
        |classed AS (
        |  SELECT *,
        |    CASE WHEN NOT old_live AND cur_live THEN 'added'
        |         WHEN old_live AND NOT cur_live THEN 'removed'
        |         WHEN old_live AND cur_live AND (old_type <> cur_type
        |           OR old_value IS DISTINCT FROM cur_value) THEN 'changed'
        |         WHEN old_live AND cur_live THEN 'unchanged' END AS diff_class,
        |    CASE WHEN old_live AND NOT cur_live THEN old_type
        |         ELSE cur_type END AS state
        |  FROM j),
        |agged AS (
        |  SELECT diff_class, state, count(*) AS n_keys,
        |    count(*) FILTER (WHERE diff_class = 'changed'
        |      AND old_type <> cur_type) AS n_type_changed,
        |    coalesce(sum(CASE WHEN old_live THEN old_value::DECIMAL(25,2) END)::DOUBLE,
        |      0.0) AS sum_value_before,
        |    coalesce(sum(CASE WHEN cur_live THEN cur_value::DECIMAL(25,2) END)::DOUBLE,
        |      0.0) AS sum_value_after
        |  FROM classed WHERE diff_class IS NOT NULL
        |  GROUP BY diff_class, state)
        |SELECT diff_class, state, n_keys, n_type_changed, sum_value_before,
        |  sum_value_after,
        |  round((sum_value_after - sum_value_before) * 100) / 100 AS net_value_delta
        |FROM agged ORDER BY diff_class, state""".stripMargin,

    "q80_cdc_upsert" ->
      """WITH ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events),
        |last AS (
        |  SELECT *, event_type = 'error' AS deleted FROM ranked WHERE rn = 1)
        |SELECT CASE WHEN deleted THEN 'deleted' ELSE 'live' END AS state,
        |  event_type, count(*) AS n_keys,
        |  sum(value::DECIMAL(25,2))::DOUBLE AS sum_value,
        |  max(epoch_us(ts)) AS latest_us
        |FROM last GROUP BY 1, 2 ORDER BY event_type""".stripMargin,

    "q81_scd2_history" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |versioned AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS version
        |  FROM flagged),
        |versions AS (
        |  SELECT user_id, version, min(us) AS from_us,
        |    min(event_type) AS state, count(*) AS n_rows
        |  FROM versioned GROUP BY user_id, version),
        |ranged AS (
        |  SELECT *, lead(from_us) OVER (PARTITION BY user_id ORDER BY version) AS to_us
        |  FROM versions)
        |SELECT user_id, count(*) AS n_versions,
        |  sum(n_rows)::BIGINT AS n_events,
        |  max(n_rows) AS max_version_events,
        |  max_by(state, version) AS current_state,
        |  max(from_us) AS current_since_us,
        |  coalesce(sum(CASE WHEN to_us IS NOT NULL THEN to_us - from_us END), 0)::BIGINT
        |    AS closed_dur_us
        |FROM ranged GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
