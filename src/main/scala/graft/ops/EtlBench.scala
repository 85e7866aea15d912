package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q131: writer-configuration benchmark scenarios — the Spark analog of the
  * reference's ETL benchmark suite (`src/lambda/etl/benchmark_suite.py:43-58`
  * `BenchmarkConfig.test_scenarios`: named conversion configs
  * baseline→full_optimization, each measured for wall time, throughput,
  * output size and speedup vs baseline).
  *
  * The reference compares its JSON→parquet converter under optimization
  * flags; the Spark-native equivalent compares the PARQUET WRITER's own
  * dials on the same relation: compression codec, dictionary encoding, and
  * in-partition sort (sorting clusters equal values so dictionary/RLE pages
  * bite — the layout lever, same family as q89's Z-order). One row per
  * scenario with integer-arithmetic derived metrics; timings are machine
  * facts, so the driver gate is rows-only and EtlBenchSpec pins the
  * invariants that must hold anywhere (identical row contents across all
  * configs, uncompressed ≥ compressed bytes).
  *
  * Scale note: each scenario is one distributed write of the source
  * relation — no collect, no driver data path; at 100 TB the same relation
  * runs with the writes pointed at the real sink and measures the real
  * codec trade (zstd smaller/slower vs snappy faster/larger) on cluster
  * hardware. Scratch outputs are deleted after measurement, so repeated
  * invocations (Verify + Bench) do not accumulate copies. */
object EtlBench {

  /** (name, parquet compression codec, dictionary encoding on, sort within
    * partitions by the low-cardinality keys first, write through the
    * bounded-retry recovery wrapper). */
  final case class Scenario(name: String, compression: String,
                            dictionary: Boolean, sorted: Boolean,
                            recovery: Boolean = false)

  /** baseline = no codec, no dictionary, arrival order — the reference's
    * un-optimized converter; the rest layer the writer's levers the way
    * the reference layers optimized_conversion → full_optimization, and
    * s5 mirrors its with_error_recovery scenario: the same write through
    * an attempt-bounded recovery wrapper, measuring the harness's
    * success-path overhead (which should be ~nothing — that is the
    * scenario's finding, not a flaw). */
  val scenarios: Seq[Scenario] = Seq(
    Scenario("s1_baseline", "none", dictionary = false, sorted = false),
    Scenario("s2_snappy_dictionary", "snappy", dictionary = true, sorted = false),
    Scenario("s3_snappy_sorted", "snappy", dictionary = true, sorted = true),
    Scenario("s4_zstd_sorted", "zstd", dictionary = true, sorted = true),
    Scenario("s5_with_recovery", "snappy", dictionary = true, sorted = false,
      recovery = true))

  final case class Measurement(scenario: String, n_rows: Long, n_files: Long,
                               output_bytes: Long, wall_ms: Long, attempts: Long)

  /** Write `src` under one scenario's writer config to `out`. Public so the
    * spec drives the exact production write path when pinning that every
    * config produces identical row contents. */
  def writeScenario(src: DataFrame, sc: Scenario, out: String): Unit = {
    val df = if (sc.sorted) src.sortWithinPartitions("event_type", "user_id")
             else src
    df.write.mode("overwrite")
      .option("compression", sc.compression)
      .option("parquet.enable.dictionary", sc.dictionary.toString)
      .parquet(out)
  }

  /** Attempt-bounded write under [[graft.flight.Flight.RetryPolicy]]
    * semantics (maxAttempts, exponential cool-down capped at maxDelayS) —
    * the batch-write analog of the DLQ replay policy. Returns the attempts
    * used; rethrows once the budget is spent. A healthy write uses exactly
    * one attempt, so the success path's measurable overhead is the wrapper
    * itself. */
  def writeWithRecovery(src: DataFrame, sc: Scenario, out: String,
      policy: graft.flight.Flight.RetryPolicy = graft.flight.Flight.RetryPolicy()): Long = {
    var attempt = 1
    while (true) {
      try { writeScenario(src, sc, out); return attempt.toLong }
      catch {
        // NonFatal only: an interrupt or OOM must abort, not sleep + rewrite
        case scala.util.control.NonFatal(_) if attempt < policy.maxAttempts =>
          val delayS = math.min(policy.maxDelayS,
            policy.baseDelayS * math.pow(policy.backoffMultiplier, attempt - 1))
          Thread.sleep((delayS * 1000).toLong)
          attempt += 1
      }
    }
    attempt.toLong // unreachable; satisfies the definite-return check
  }

  private def dirStats(path: java.io.File): (Long, Long) = {
    val parts = Option(path.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    (parts.length.toLong, parts.map(_.length).sum)
  }

  /** Run every scenario against `src`, leaving the outputs in `tmp` for the
    * caller to inspect or delete. */
  def runScenarios(src: DataFrame, tmp: String): Seq[Measurement] = {
    val n = src.count()
    // untimed warm-up writes: the FIRST parquet write in a JVM pays one-time
    // writer class-load and JIT cost, and each CODEC pays its own class-load
    // on first use (the rep1-inflation rule from the bench notes); warming
    // only the baseline would leave snappy/zstd first-use cost inside the
    // timed s2/s4 runs, biasing speedup_x100 against the compressed configs.
    // One small slice per distinct (codec, dictionary) config actually used
    // warms every path — including the baseline's dictionary-disabled
    // encoder — without a second full pass.
    val warm = src.limit(1000)
    scenarios.map(sc => (sc.compression, sc.dictionary)).distinct.zipWithIndex
      .foreach { case ((codec, dict), i) =>
        writeScenario(warm, Scenario(s"warm_$codec", codec,
          dictionary = dict, sorted = false), s"$tmp/__warmup_$i")
      }
    scenarios.map { sc =>
      val out = s"$tmp/${sc.name}"
      val t0 = System.nanoTime()
      val attempts =
        if (sc.recovery) writeWithRecovery(src, sc, out)
        else { writeScenario(src, sc, out); 1L }
      val wallMs = math.max(1L, (System.nanoTime() - t0) / 1000000L)
      val (files, bytes) = dirStats(new java.io.File(out))
      Measurement(sc.name, n, files, bytes, wallMs, attempts)
    }
  }

  /** The q131 relation: one row per scenario over the events table.
    * Derived columns in pure integer arithmetic (half-up where rounding):
    * records_per_sec, bytes_pct_of_baseline, speedup_x100 (wall vs
    * baseline; >100 = faster than baseline). */
  def q131EtlBenchmark(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_etlbench")
    val ms =
      try runScenarios(graft.Tables.events(spark, dir), tmp.toString)
      finally { // measurements are kept, scratch bytes are not
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(tmp) // holds directory handles
        try walk.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      }
    val base = ms.find(_.scenario == "s1_baseline").get
    val rows = ms.map { m =>
      (m.scenario, m.n_rows, m.n_files, m.output_bytes, m.wall_ms, m.attempts,
        (2 * m.n_rows * 1000 + m.wall_ms) / (2 * m.wall_ms),
        (2 * m.output_bytes * 100 + base.output_bytes) / (2 * base.output_bytes),
        (2 * base.wall_ms * 100 + m.wall_ms) / (2 * m.wall_ms))
    }
    import spark.implicits._
    rows.toDF("scenario", "n_rows", "n_files", "output_bytes", "wall_ms",
        "attempts", "records_per_sec", "bytes_pct_of_baseline", "speedup_x100")
      .orderBy(col("scenario"))
  }
}
