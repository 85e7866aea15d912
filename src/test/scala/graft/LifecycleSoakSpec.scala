package graft

import org.apache.spark.sql.functions._

import graft.ops.Maintenance
import graft.ops.Maintenance.LayoutFacts
import graft.sim.Similarity
import graft.streaming.Streaming

/** The END-TO-END lifecycle soak (r15 verdict item 4): every maintenance
  * arm is spec'd pairwise elsewhere; this scenario drives the full
  * composition over one appendable vector index — gate-ingest 10
  * micro-batches, takedown mid-stream, PARTIAL fold, re-admission of
  * deleted content, crash replays injected between arms, full fold,
  * schedule → tick → quiet — asserting the conservation laws at every
  * seam:
  *  - the index IS the accepted corpus (rows = tables × accepted ids);
  *  - no deleted row is ever served, before or after any fold;
  *  - replays recompute identical decisions and change nothing;
  *  - deleted content re-ingested after the takedown is RE-ADMITTED
  *    (the q158 contract, vector flavor — gates read the live view);
  *  - the schedule goes quiet once the tools it asked for have run.
  */
class LifecycleSoakSpec extends SparkSpecBase {
  import spark.implicits._

  private val planes = 5
  private val tables = 2

  test("ingest gate -> delete -> partial fold -> re-admission -> full " +
      "fold -> schedule/tick, with crash replays between arms: no row " +
      "lost, no deleted row served or gate-matched, schedule quiet") {
    val tbl = "g_soak_idx"
    val decDir = java.nio.file.Files.createTempDirectory("g_soak_dec").toString
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val tmp = java.nio.file.Files.createTempDirectory("g_soak").toString
    Streaming.createAppendableIndex(spark, tbl, s"$tmp/index", buckets = 4)
    val eSlim = Tables.embeddings(spark, Sf001)
      .select(col("vec_id"), col("embedding"))

    def slice(b: Int) = eSlim.filter(col("vec_id") >= b * 10L
      && col("vec_id") < b * 10L + 10L)
    def copyOf(ids: Seq[Long], shift: Long) =
      eSlim.filter(col("vec_id").isin(ids: _*))
        .select((col("vec_id") + shift).as("vec_id"), col("embedding"))
    def decisions(bid: Long) = spark.read.parquet(decDir)
      .filter(col("batch_id") === bid)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("status"))
      .toMap
    def acceptedIds() = spark.read.parquet(decDir)
      .filter(col("status") === "accepted")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val tombId = Similarity.TombstoneBatchId
    def indexIds() = Similarity.liveIndexRelation(spark.table(tbl))
      .select(col("vec_id")).distinct().collect().map(_.getLong(0)).toSet
    def top1(content: Long, qid: Long): Long = {
      val probes = eSlim.filter(col("vec_id") === content)
        .select(lit(qid).as("qid"), col("embedding"))
      Similarity.probeIndexLive(spark, tbl, probes, planes, tables)
        .collect()(0).getAs[Long]("retrieved_id")
    }

    // ---- arm 1: 5 ingest batches; batch 3 carries dups of batch 0 rows
    (0 until 3).foreach { b =>
      Streaming.gateBatch(slice(b), b.toLong, tbl, planes, tables, decDir)
    }
    Streaming.gateBatch(slice(3).unionByName(copyOf(Seq(1L, 2L), 9000L)),
      3L, tbl, planes, tables, decDir)
    Streaming.gateBatch(slice(4), 4L, tbl, planes, tables, decDir)
    val d3 = decisions(3L)
    assert(d3(9001L) === "dup_index" && d3(9002L) === "dup_index", d3.toString)
    assert(acceptedIds() === (0L until 50L).toSet)
    assert(indexIds() === acceptedIds(), "the index IS the accepted corpus")

    // crash replay of batch 3 AFTER its append: identical decisions
    Streaming.gateBatch(slice(3).unionByName(copyOf(Seq(1L, 2L), 9000L)),
      3L, tbl, planes, tables, decDir)
    assert(decisions(3L) === d3)
    assert(indexIds() === (0L until 50L).toSet)

    // ---- arm 2: takedown of ids 12, 27 (batches 1 and 2) mid-stream
    val victims = Seq(12L, 27L)
    Streaming.tombstoneIndexRows(spark, tbl,
      eSlim.filter(col("vec_id").isin(victims: _*)), planes, tables)
    // crash replay of the delete batch: marks land idempotently
    Streaming.tombstoneIndexRows(spark, tbl,
      eSlim.filter(col("vec_id").isin(victims: _*)), planes, tables)
    assert(indexIds() === (0L until 50L).toSet -- victims)
    // serving flips off the victims immediately (nearest surviving row)
    assert(top1(12L, 700000L) !== 12L)

    // ---- arm 3: PARTIAL fold (uptoBatch = 1) — victim 12's row (batch 1)
    // purges with the fold; victim 27's row (batch 2) is beyond it, so
    // its mark must survive
    Streaming.foldIndexBase(spark, tbl, uptoBatch = 1L)
    val marksAfterPartial = spark.table(tbl)
      .filter(col("batch_id") === tombId)
      .select(col("vec_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(marksAfterPartial === Set(27L), marksAfterPartial.toString)
    assert(indexIds() === (0L until 50L).toSet -- victims)
    assert(top1(27L, 700001L) !== 27L)

    // ---- arm 4: re-ingest deleted content + novel rows in batch 5 —
    // the takedown's content must RE-ADMIT (gates read the live view)
    Streaming.gateBatch(
      copyOf(victims, 20000L).unionByName(slice(5)),
      5L, tbl, planes, tables, decDir)
    val d5 = decisions(5L)
    assert(d5(20012L) === "accepted", s"deleted content must re-admit: $d5")
    assert(d5(20027L) === "accepted", s"deleted content must re-admit: $d5")
    assert(slice(5).collect().map(_.getLong(0))
      .forall(id => d5(id) === "accepted"), d5.toString)
    // ...and a duplicate of STILL-LIVE content keeps rejecting
    Streaming.gateBatch(copyOf(Seq(35L), 21000L).unionByName(slice(6)),
      6L, tbl, planes, tables, decDir)
    assert(decisions(6L)(21035L) === "dup_index")

    // ---- arm 5: three more batches to 10 total, then a second takedown
    // hitting a RE-ADMITTED id (delete must work twice for one content)
    (7 until 10).foreach { b =>
      Streaming.gateBatch(slice(b), b.toLong, tbl, planes, tables, decDir)
    }
    Streaming.tombstoneIndexRows(spark, tbl,
      eSlim.filter(col("vec_id") === 12L)
        .select((col("vec_id") + 20000L).as("vec_id"), col("embedding")),
      planes, tables)
    val liveNow = (0L until 100L).toSet -- victims ++ Set(20027L)
    assert(indexIds() === liveNow)

    // ---- arm 6: full fold past the live head, crash-replayed
    Streaming.foldIndexBase(spark, tbl, uptoBatch = 9L)
    Streaming.foldIndexBase(spark, tbl, uptoBatch = 9L) // re-fold: no-op
    assert(spark.table(tbl).filter(col("batch_id") === tombId).count() === 0)
    assert(spark.table(tbl).filter(col("batch_id") >= 0).count() === 0)
    assert(indexIds() === liveNow, "full fold must be lossless mod deletions")
    assert(spark.table(tbl).count() === liveNow.size.toLong * tables)
    assert(top1(27L, 700002L) === 20027L,
      "the re-admitted copy serves the deleted original's content")

    // ---- arm 7: the scheduler sees a quiet layout and stays quiet;
    // planted decay (re-appending batches) wakes fold, tick runs it,
    // the re-audit is quiet again. Facts ride the shared gather (honest
    // band denominator, mark ages) under a PINNED clock.
    val soakNow = 9000L
    def factsNow() = Seq(
      Maintenance.appendableLayoutFacts(spark, "soak", tbl, 4L, soakNow))
    assert(Maintenance.schedule(factsNow().toDF())
      .filter(col("triggered") && col("check").isin("fold", "purge"))
      .count() === 0)
    (10 until 19).foreach { b =>
      Streaming.gateBatch(slice(b), b.toLong, tbl, planes, tables, decDir)
    }
    val due = Maintenance.schedule(factsNow().toDF())
    assert(due.filter(col("triggered") && col("check") === "fold").count() === 1)
    // no outstanding debt, so decay binds the AMORTIZED leveled fold
    // (r17) — the batches consolidate into a generation, the base is
    // never rewritten
    Maintenance.tick(due, Map(("soak", "fold_index_leveled") -> (() => {
      Streaming.foldIndexLeveled(spark, tbl, uptoBatch = 18L); ()
    })))
    assert(Maintenance.schedule(factsNow().toDF())
      .filter(col("triggered")).count() === 0)
    assert(indexIds() === liveNow ++ (100L until 190L))

    // ---- arm 8 (r19): OVER-BAND takedown debt drives the r18 band +
    // the mark-scoped purge end-to-end — tick (defaultTools bindings) →
    // purge_index_tombstones → crash replay → quiet re-audit, zero rows
    // lost outside the victims. 35 victims × 2 tables = 70 marks: above
    // the 64-mark floor and 70·64 ≫ the ~378-row corpus, so the band
    // breaches while the young age (1000 s) keeps the SLA row quiet.
    val victims2 = (100L until 135L)
    Streaming.tombstoneIndexRows(spark, tbl,
      eSlim.filter(col("vec_id").isin(victims2.map(Long.box): _*)),
      planes, tables, epoch = soakNow - 1000L)
    val due8 = Maintenance.schedule(factsNow().toDF())
    assert(due8.filter(col("triggered") && col("check") === "purge")
      .count() === 1, due8.collect().mkString("\n"))
    assert(due8.filter(col("triggered") && col("check") === "purge_age")
      .count() === 0, "young debt stays off the SLA row")
    assert(due8.filter(col("triggered")).count() === 1)
    val ran8 = Maintenance.tick(due8, Maintenance.defaultTools(spark,
      appendable = Map(
        "soak" -> ((tbl, () => Streaming.maxLiveBatch(spark, tbl))))))
    assert(ran8 === Seq(("soak", "purge", "purge_index_tombstones", true)))
    // crash replay of the purge tool: idempotent, nothing re-erased
    Streaming.purgeIndexTombstonesConverging(spark, tbl,
      Streaming.maxLiveBatch(spark, tbl))
    assert(Maintenance.schedule(factsNow().toDF())
      .filter(col("triggered")).count() === 0,
      "the re-audit is quiet after the purge")
    val liveFinal = liveNow ++ (100L until 190L) -- victims2
    assert(indexIds() === liveFinal)
    // PHYSICAL erasure, not anti-join masking: raw row count drops to
    // exactly the survivors, marks and stamps fully retired
    assert(spark.table(tbl).count() === liveFinal.size.toLong * tables)
    assert(spark.table(tbl).filter(col("batch_id") === tombId).count() === 0)
    assert(Streaming.appendableTombstoneAge(spark, tbl, soakNow) === -1L)
  }
}
