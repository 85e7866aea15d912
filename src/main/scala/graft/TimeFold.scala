package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Measurement harness for the r16 verdict's open 100x question: what does
  * [[Streaming.foldIndexBase]] COST as the folded base grows relative to
  * the batches it absorbs? The fold recomputes the base as
  * dedup(live batches ∪ base) — a full read + dedup-shuffle + staging
  * write + bucketed rewrite of EVERYTHING folded so far — so per-fold
  * cost should be linear in base+batch rows, which makes a fixed
  * `foldEvery` cadence QUADRATIC in total corpus size over the stream's
  * lifetime (sum of an arithmetic series of base sizes), while a
  * geometric trigger (fold only when the unfolded batch mass is a
  * constant fraction of the base) folds each row O(log n) times for an
  * O(n log n) lifetime total at the price of proportionally more live
  * partitions between folds.
  *
  * One scenario per base:batch ratio: build a base of ratio x batchRows
  * (append as batch 0, fold), append a fixed batchRows batch, time the
  * fold that absorbs it. Vectors are hash-derived synthetics (the r13
  * rule: xxhash64 components, never sin — and content only feeds the
  * untimed sign-at-append step anyway; the fold moves stored rows).
  * Numbers and the derived foldEvery sizing rule live in PLANS.md.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.TimeFold [batchRows]"
  */
object TimeFold {
  def main(args: Array[String]): Unit = {
    val batchRows = args.headOption.map(_.toLong).getOrElse(10000L)
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
    val tmp = java.nio.file.Files.createTempDirectory("graft_time_fold")

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

    // warmup (untimed in the table below): pays JIT/codegen once so the
    // ladder's first rung is comparable to the rest
    locally {
      val tbl = "g_timefold_warm"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      Streaming.createAppendableIndex(spark, tbl, s"$tmp/warm", buckets)
      Streaming.appendIndexBatch(vecs(0, batchRows), 0L, tbl, planes, tables)
      Streaming.foldIndexBase(spark, tbl, 0L)
      Streaming.appendIndexBatch(vecs(batchRows, batchRows), 1L, tbl,
        planes, tables)
      Streaming.foldIndexBase(spark, tbl, 1L)
    }

    val results = Seq(1L, 3L, 10L, 30L, 100L).map { ratio =>
      val baseRows = ratio * batchRows
      val tbl = s"g_timefold_r$ratio"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      Streaming.createAppendableIndex(spark, tbl, s"$tmp/r$ratio", buckets)
      Streaming.appendIndexBatch(vecs(0, baseRows), 0L, tbl, planes, tables)
      val buildS = timed(f"  (base build fold: $baseRows%7d rows)")(
        Streaming.foldIndexBase(spark, tbl, 0L))
      Streaming.appendIndexBatch(vecs(baseRows, batchRows), 1L, tbl,
        planes, tables)
      val foldS = timed(f"fold base=${ratio}%3dx batch=$batchRows")(
        Streaming.foldIndexBase(spark, tbl, 1L))
      // the LEVELED comparison on the same table: one more batch, folded
      // into a generation — the base is never read, so this should be
      // FLAT across the ratio ladder
      Streaming.appendIndexBatch(vecs(baseRows + batchRows, batchRows), 2L,
        tbl, planes, tables)
      val levS = timed(f"leveled base=${ratio}%3dx batch=$batchRows")(
        Streaming.foldIndexLeveled(spark, tbl, 2L))
      (ratio, baseRows, buildS, foldS, levS)
    }

    println("\nratio baseRows batchRows buildFold_s baseFoldS sPerMrow leveledS")
    results.foreach { case (r, b, bs, fs, ls) =>
      val perM = fs / ((b + batchRows) * tables / 1e6)
      println(f"$r%5d $b%8d $batchRows%9d $bs%11.2f $fs%9.2f $perM%8.2f $ls%8.2f")
    }
    spark.stop()
  }
}
