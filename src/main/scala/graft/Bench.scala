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
    // force every output column: a bare count() lets column pruning delete
    // the very expressions being benchmarked (windows, scores).
    // bit_xor (not sum) folds the per-row hashes: xxhash64 spans the full
    // Long range, so sum() overflows under ANSI mode and aborts the job.
    import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}
    def run1(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err =
        try {
          val df = fn(spark, sfDir)
          df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
            .agg(bit_xor(col("h"))).collect()
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
    // that run in 0.5-2s isolated). A query that took >3s AND >4x the
    // suite median is re-run once (JIT-warm by now) and reports the
    // faster of the two; the JSON carries which queries were retried so
    // the number is never silently "better" than a single cold pass.
    // (r8→r9: trigger lowered from >5s/>5x — r8's q88 "regression" was a
    // 4.47s stall sliding just under the old threshold and polluting the
    // round-over-round comparison for a file with no diff.)
    // The lowered trigger also sweeps in queries that are GENUINELY ~3s
    // warm (the dedup family sits at 3-4s with a ~0.65s suite median), so
    // the report splits the retried set: "stall_retries" = the rerun came
    // back ≥2x faster (a real freeze was clipped); "slow_confirmed" = the
    // rerun reproduced the time (legitimately expensive query, no stall).
    // Only the former should prompt cross-round regression suspicion.
    val median = {
      val ts = firstPass.map(_._3).sorted
      if (ts.isEmpty) 0.0 else ts(ts.size / 2)
    }
    // 4th field: 0 = not retried, 1 = retried + stall clipped (rerun ≥2x
    // faster), 2 = retried + time confirmed (slow query, not a stall)
    val results = firstPass.map { case (name, fn, t, err) =>
      if (err.isEmpty && t > 3.0 && t > 4.0 * median) {
        val (t2, err2) = run1(name, fn)
        // A retry that errors must not overwrite a valid cold measurement:
        // keep the successful first pass and only use the rerun when it too
        // succeeded (then report the faster of the two).
        if (err2.isEmpty) (name, math.min(t, t2), None, if (t >= 2.0 * t2) 1 else 2)
        else (name, t, err, 1)
      } else (name, t, err, 0)
    }
    val calibAfter = calibrate()
    val retried = results.filter(_._4 == 1).map(_._1)
    val slowConfirmed = results.filter(_._4 == 2).map(_._1)
    val failed = results.filter(_._3.isDefined)
    val qs = results
      .map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed
      .map { case (k, _, e, _) => s"\"" + k + "\":\"" + e.get.replace("\\", "/").replace("\"", "'") + "\"" }
      .mkString("{", ",", "}")
    val retriedJson = retried.map("\"" + _ + "\"").mkString("[", ",", "]")
    val slowJson = slowConfirmed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val calib = f""""calib_before_s":$calibBefore%.3f,"calib_after_s":$calibAfter%.3f"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failed.size},"errors":$errs,"stall_retries":$retriedJson,"slow_confirmed":$slowJson,$calib}"""
    println(line)
    // Harness tail-windows can cut the front off the ~3 KB full line, so
    // also (a) drop a copy on disk and (b) end with a compact summary —
    // qNN short keys, ms precision — that fits whole inside a 2 KB tail.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line)
    val qsShort = results
      .map { case (k, v, _, _) => s"\"" + k.takeWhile(_ != '_') + "\":" + math.round(v * 1000) / 1000.0 }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsShort,"sf":"$sfDir","failed":${failed.size},"n_queries":${results.size},"stall_retries":$retriedJson,"slow_confirmed":$slowJson,$calib}""")
    failed.foreach { case (k, _, e, _) => System.err.println(s"BENCH FAIL $k: ${e.get}") }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
