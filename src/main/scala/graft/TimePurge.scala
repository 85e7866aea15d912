package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Measurement harness for the r17 verdict's purge-amortization question:
  * does [[Streaming.purgeIndexTombstones]]' mark-scoped rewrite actually
  * beat the base fold at realistic debt, and by how much as the corpus
  * grows? Per base:batch ratio the table holds a BIG old generation
  * (ratio × batchRows, at level 1) and a SMALL recent one (batchRows, at
  * level 0) — the steady-state shape a leveled-fold stream leaves — and
  * three 1%-debt plants are timed in sequence:
  *
  *  - `purge recent`: victims drawn from the RECENT generation only (the
  *    realistic trickle-takedown profile — fresh content attracts the
  *    takedowns). Only level 0 rewrites, so this should be FLAT across
  *    the ladder.
  *  - `purge uniform`: victims uniform over the whole corpus — every
  *    generation contains victims, so the scoped purge degrades to
  *    rewriting everything a base fold would (its worst case; the win
  *    here is only the skipped consolidation shuffle).
  *  - `fold base`: [[Streaming.foldIndexBase]] on the same 1% debt — the
  *    r17 debt tool, linear in base rows by measurement (TimeFold).
  *
  * The `converging` mode (r20, VERDICT task 3) measures the SLA path of
  * [[Streaming.purgeIndexTombstonesConverging]] instead: 1% debt resident
  * in a LIVE (unconsolidated) batch — the state where the plain purge
  * provably spins (live batches are never rewritten, so marks survive and
  * the purge_age row re-fires every tick). Per rung, two identically
  * shaped tables (two-generation base + a live batch 3 carrying the
  * victims) time the converging tool against its decomposition — plain
  * purge, manual [[Streaming.foldIndexLeveled]] of the committed head,
  * re-purge — so the converging path's asserted cost model (≈ leveled
  * fold + scoped purge, never O(base) beyond what the carry chain owes)
  * is measured, not asserted.
  *
  * Vectors are hash-derived synthetics (the r13 rule). Numbers and the
  * resulting schedule policy live in PLANS.md (r18; converging arm r20).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.TimePurge [batchRows] [mode]"
  *   mode: `arms` (default — the r18 recent/uniform/fold ladder) or
  *         `converging` (the r20 SLA-path ladder)
  */
object TimePurge {
  def main(args: Array[String]): Unit = {
    val batchRows = args.headOption.map(_.toLong).getOrElse(10000L)
    val mode = args.drop(1).headOption.getOrElse("arms")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sim.Similarity.ensureRegistered(spark)

    val planes = 12; val tables = 2; val buckets = 64
    val tmp = java.nio.file.Files.createTempDirectory("graft_time_purge")

    def timed[A](label: String)(body: => A): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label $s%.2f s")
      s
    }

    def vecs(from: Long, n: Long): DataFrame =
      spark.range(from, from + n)
        .select(col("id").as("vec_id"),
          array((0 until 64).map(d =>
            (pmod(xxhash64(col("id") * 64 + d), lit(20001)).cast("double")
              / 10000.0 - 1.0).cast("float")): _*).as("embedding"))
        .repartition(spark.sparkContext.defaultParallelism)

    // victims: every 100th id of [from, until) shifted by `salt` — a 1%
    // plant whose three draws (recent / uniform / fold) are disjoint
    def victims(from: Long, until: Long, salt: Long): DataFrame =
      vecs(from, until - from)
        .filter(pmod(col("vec_id"), lit(100L)) === salt)

    // binary-counter construction of the steady-state two-generation
    // shape: base → level 0, +seed batch merges it up to level 1,
    // recent batch folds fresh into the now-empty level 0
    def build(tbl: String, baseRows: Long): (Long, Long) = {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      Streaming.createAppendableIndex(spark, tbl, s"$tmp/$tbl", buckets)
      Streaming.appendIndexBatch(vecs(0, baseRows), 0L, tbl, planes, tables)
      Streaming.foldIndexLeveled(spark, tbl, 0L)
      Streaming.appendIndexBatch(vecs(baseRows, 16L), 1L, tbl, planes, tables)
      Streaming.foldIndexLeveled(spark, tbl, 1L)
      val recentFrom = baseRows + 16L
      Streaming.appendIndexBatch(vecs(recentFrom, batchRows), 2L, tbl,
        planes, tables)
      Streaming.foldIndexLeveled(spark, tbl, 2L)
      (recentFrom, recentFrom + batchRows)
    }

    // warmup: pays JIT/codegen once so the ladder's first rung compares
    locally {
      val (rf, ru) = build("g_timepurge_warm", batchRows)
      Streaming.tombstoneIndexRows(spark, "g_timepurge_warm",
        victims(rf, ru, 7L), planes, tables, epoch = 1L)
      Streaming.purgeIndexTombstones(spark, "g_timepurge_warm")
      Streaming.tombstoneIndexRows(spark, "g_timepurge_warm",
        victims(0, ru, 11L), planes, tables, epoch = 2L)
      Streaming.foldIndexBase(spark, "g_timepurge_warm", 2L)
    }

    if (mode == "converging") {
      // the two-generation shape plus a LIVE batch 3 holding the victims
      def buildLive(tbl: String, baseRows: Long): (Long, Long) = {
        val (_, until) = build(tbl, baseRows)
        Streaming.appendIndexBatch(vecs(until, batchRows), 3L, tbl,
          planes, tables)
        (until, until + batchRows)
      }
      val results = Seq(1L, 3L, 10L, 30L, 100L).map { ratio =>
        val baseRows = ratio * batchRows
        val (lf, lu) = buildLive(s"g_timepurge_c$ratio", baseRows)
        buildLive(s"g_timepurge_m$ratio", baseRows)
        Streaming.tombstoneIndexRows(spark, s"g_timepurge_c$ratio",
          victims(lf, lu, 37L), planes, tables, epoch = 1L)
        Streaming.tombstoneIndexRows(spark, s"g_timepurge_m$ratio",
          victims(lf, lu, 37L), planes, tables, epoch = 1L)
        val convS = timed(f"purge converging base=${ratio}%3dx")(
          Streaming.purgeIndexTombstonesConverging(spark,
            s"g_timepurge_c$ratio", 3L))
        val manS = timed(f"purge+fold manual base=${ratio}%3dx") {
          Streaming.purgeIndexTombstones(spark, s"g_timepurge_m$ratio")
          Streaming.foldIndexLeveled(spark, s"g_timepurge_m$ratio", 3L)
          Streaming.purgeIndexTombstones(spark, s"g_timepurge_m$ratio")
        }
        // both tables must have erased the debt completely
        Seq(s"g_timepurge_c$ratio", s"g_timepurge_m$ratio").foreach { t =>
          val marks = spark.table(t).filter(
            col("batch_id") === graft.sim.Similarity.TombstoneBatchId).count()
          require(marks == 0L, s"$t still owes $marks marks after converge")
        }
        (ratio, baseRows, convS, manS)
      }
      println("\nratio baseRows batchRows convergingS manualS")
      results.foreach { case (r, b, cs, ms) =>
        println(f"$r%5d $b%8d $batchRows%9d $cs%11.2f $ms%7.2f")
      }
      spark.stop()
      return
    }

    val results = Seq(1L, 3L, 10L, 30L, 100L).map { ratio =>
      val baseRows = ratio * batchRows
      val tbl = s"g_timepurge_r$ratio"
      val (recentFrom, until) = build(tbl, baseRows)
      Streaming.tombstoneIndexRows(spark, tbl,
        victims(recentFrom, until, 7L), planes, tables, epoch = 1L)
      val recentS = timed(f"purge recent  base=${ratio}%3dx")(
        Streaming.purgeIndexTombstones(spark, tbl))
      Streaming.tombstoneIndexRows(spark, tbl,
        victims(0, until, 11L), planes, tables, epoch = 2L)
      val uniformS = timed(f"purge uniform base=${ratio}%3dx")(
        Streaming.purgeIndexTombstones(spark, tbl))
      Streaming.tombstoneIndexRows(spark, tbl,
        victims(0, until, 23L), planes, tables, epoch = 3L)
      val foldS = timed(f"fold base     base=${ratio}%3dx")(
        Streaming.foldIndexBase(spark, tbl, 2L))
      (ratio, baseRows, recentS, uniformS, foldS)
    }

    println("\nratio baseRows batchRows purgeRecentS purgeUniformS baseFoldS")
    results.foreach { case (r, b, rs, us, fs) =>
      println(f"$r%5d $b%8d $batchRows%9d $rs%12.2f $us%13.2f $fs%9.2f")
    }
    spark.stop()
  }
}
