package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries in isolation (default 2 reps — rep1 shows
  * JIT/codegen cold-start, rep2 the steady state), same checksum action as
  * Bench.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.TimeQ /root/testdata/sf0.1 q24_ngram_jaccard"
  *
  * Options (r20, the q115 rep2-slowdown investigation):
  *   -reps N   run N reps instead of 2
  *   -gc       System.gc() + 2 s pause between reps — lets the
  *             ContextCleaner actually drain dropped localCheckpoint /
  *             broadcast blocks, isolating "rep1's session debris slows
  *             rep2" from "the plan is slower warm" (q115's profile shows
  *             rep2 > rep1 in 8 of 9 recorded ledger rounds; PLANS.md r20).
  *             Finding: for q115 the drain made rep2 WORSE (+75%) while
  *             its family behaved normally — the asymmetry is post-GC
  *             heap condition, not checkpoint debris; see the PLANS.md
  *             r20 ledger note for the full measurement.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    var reps = 2
    var gcBetween = false
    val names = scala.collection.mutable.Buffer.empty[String]
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "-reps" =>
          require(i + 1 < args.length, "-reps needs a count")
          reps = args(i + 1).toInt; i += 2
        case "-gc" => gcBetween = true; i += 1
        case n => names += n; i += 1
      }
    }
    // a zero/negative count would run nothing and print nothing — a
    // confusing dead run for a tool whose readings feed PLANS.md
    require(reps >= 1, s"-reps must be >= 1, got $reps")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => }
    // SPARK_GRAFT_JOBS=1: per-rep job/stage/task counts — the fixed-cost
    // shape of a query (every job pays scheduling + result handling; at
    // test SFs a multi-action query is often overhead-bound, r21)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stagesN = new java.util.concurrent.atomic.AtomicInteger
    val tasksN = new java.util.concurrent.atomic.AtomicInteger
    if (sys.env.contains("SPARK_GRAFT_JOBS"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.incrementAndGet()
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            stagesN.incrementAndGet(); tasksN.addAndGet(s.stageInfo.numTasks)
            if (sys.env.get("SPARK_GRAFT_JOBS").contains("2")) {
              val si = s.stageInfo
              val wall = (for { a <- si.submissionTime; b <- si.completionTime }
                yield b - a).getOrElse(-1L)
              println(f"  STAGE ${si.stageId}%4d tasks=${si.numTasks}%3d " +
                f"wall=$wall%5d ms task=${si.taskMetrics.executorRunTime}%6d ms")
            }
          }
        })
    import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}
    names.foreach { n =>
      (1 to reps).foreach { rep =>
        if (gcBetween && rep > 1) { System.gc(); Thread.sleep(2000) }
        jobs.set(0); stagesN.set(0); tasksN.set(0)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
          .agg(bit_xor(col("h"))).collect()
        val counts = if (sys.env.contains("SPARK_GRAFT_JOBS"))
          s" jobs=${jobs.get} stages=${stagesN.get} tasks=${tasksN.get}"
        else ""
        println(f"TIMEQ $n rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s$counts")
      }
    }
    spark.stop()
  }
}
