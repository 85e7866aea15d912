package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: absorb JIT/codegen/IO-cache startup outside the timed loop
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => }
    // the forcing action lives in BenchReport.checksummed (shared with the
    // q132 warm/cold profiler so the two measurements stay comparable)
    import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}
    def run1(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err =
        try {
          BenchReport.checksummed(fn(spark, sfDir)).collect()
          None
        } catch { case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(200)) }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // Host-noise calibration: a FIXED workload (distributed hash fold over a
    // constant range + a tiny parquet scan) timed before and after the suite.
    // Its nominal cost is constant across rounds, so the driver can normalize
    // suite totals across host conditions (r05's 483s vs 110s clean was pure
    // microVM CPU steal — this field makes that visible instead of costing a
    // round of perf signal). Runs after warmup so JIT is out of the number.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 32)
        .select(xxhash64(col("id")).as("h")).agg(bit_xor(col("h"))).collect()
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      r.select(xxhash64(struct(r.columns.toIndexedSeq.map(col): _*)).as("h"))
        .agg(bit_xor(col("h"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // untimed: JIT-warm the probe so before/after are comparable
    val calibBefore = calibrate()
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (t, err) = run1(name, fn); (name, fn, t, err)
    }
    // Stall mitigation: this host occasionally freezes queries for
    // 5-100x their normal time (CPU steal on the microVM — different
    // queries each run; observed 50s, 240s, 44s, 12s spikes on queries
    // that run in 0.5-2s isolated). A query over the retry trigger
    // (BenchReport.shouldRetry: >1s AND >4x the suite median — r10 dropped
    // the 3s absolute floor after q49 regressed 5.3x at 2.68s, just under
    // it) is re-run once (JIT-warm by now) and reports the faster of the
    // two. The report splits the retried set: "stall_retries" = rerun came
    // back ≥2x faster (a real freeze was clipped); "slow_confirmed" = the
    // rerun reproduced the time (legitimately expensive query, no stall);
    // "retry_errors" = the rerun errored and proved nothing. Only
    // stall_retries should clear cross-round regression suspicion.
    val median = {
      val ts = firstPass.map(_._3).sorted
      if (ts.isEmpty) 0.0 else ts(ts.size / 2)
    }
    val results: Seq[BenchReport.QRes] = firstPass.map { case (name, fn, t, err) =>
      if (err.isEmpty && !BenchReport.retryExempt(name) &&
          BenchReport.shouldRetry(t, median))
        BenchReport.classifyRetry(name, t, run1(name, fn))
      else (name, t, err, 0)
    }
    val calibAfter = calibrate()
    val failed = results.filter(_._3.isDefined)
    // Full line first (also persisted to disk); the compact line LAST — it
    // is the driver's parse target and BenchReport bounds its length so it
    // always fits whole inside the 2 KB stdout tail window (see scaladoc).
    val line = BenchReport.fullLine(results, sfDir, calibBefore, calibAfter)
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line)
    println(BenchReport.compactLine(results, sfDir, calibBefore, calibAfter))
    failed.foreach { case (k, _, e, _) => System.err.println(s"BENCH FAIL $k: ${e.get}") }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
