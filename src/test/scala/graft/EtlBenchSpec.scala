package graft

import org.apache.spark.sql.functions._
import graft.ops.EtlBench

/** Pins q131's config-independent invariants (the relation itself is
  * rows-only in the driver gate — timings are machine facts):
  * every writer scenario must produce byte-identical ROW CONTENTS, the
  * uncompressed baseline must not be smaller than the compressed variants,
  * and the entry must clean up its scratch outputs. */
class EtlBenchSpec extends SparkSpecBase {

  test("all writer scenarios produce identical row contents") {
    import spark.implicits._
    // low-cardinality strings that arrive UNCLUSTERED (hash-scrambled, so
    // the in-partition sort genuinely creates runs for RLE/dictionary to
    // exploit) + a long payload correlated with the sort key; enough rows
    // that codecs visibly bite, small enough to stay fast
    val etype = concat(lit("etype_"), pmod(xxhash64(col("id")), lit(5)).cast("string"))
    val src = spark.range(0, 50000).select(
      col("id"),
      etype.as("event_type"),
      pmod(xxhash64(col("id"), lit(7)), lit(97)).as("user_id"),
      concat(lit("payload_"), repeat(etype, 8)).as("payload"))
    val tmp = java.nio.file.Files.createTempDirectory("etlbench_spec").toString
    try testScenarios(src, tmp)
    finally { // the spec owns its scratch the way q131 owns its own
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } finally walk.close()
    }
  }

  private def testScenarios(src: org.apache.spark.sql.DataFrame, tmp: String): Unit = {
    EtlBench.runScenarios(src, tmp)
    def contentHash(path: String): Long = {
      val df = spark.read.parquet(path)
      df.select(xxhash64(struct(df.columns.sorted.map(col).toIndexedSeq: _*)).as("h"))
        .agg(sum(col("h").cast("decimal(38,0)"))).head.getDecimal(0).longValue
    }
    val hashes = EtlBench.scenarios.map(sc => sc.name -> contentHash(s"$tmp/${sc.name}"))
    assert(hashes.map(_._2).distinct.size === 1,
      s"writer configs changed row contents: $hashes")
    // compression must never grow the data on a repetitive corpus: the
    // uncompressed/undictionaried baseline is the upper bound
    val bytes = EtlBench.scenarios.map { sc =>
      sc.name -> new java.io.File(s"$tmp/${sc.name}").listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length).sum
    }.toMap
    EtlBench.scenarios.filter(_.name != "s1_baseline").foreach { sc =>
      assert(bytes(sc.name) < bytes("s1_baseline"),
        s"${sc.name} did not compress below baseline: $bytes")
    }
    // the sorted snappy layout must beat unsorted snappy: sorting clusters
    // equal values so dictionary/RLE pages bite — the scenario ladder's point
    assert(bytes("s3_snappy_sorted") <= bytes("s2_snappy_dictionary"), bytes.toString)
  }

  test("q131 relation: one row per scenario, sane derived metrics, no scratch leak") {
    val tmpBefore = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().count(_.getName.startsWith("graft_etlbench"))
    val rows = EtlBench.q131EtlBenchmark(spark, Sf0001).collect()
    val tmpAfter = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().count(_.getName.startsWith("graft_etlbench"))
    assert(tmpAfter === tmpBefore, "q131 leaked scratch output directories")
    assert(rows.map(_.getAs[String]("scenario")).toSeq ===
      EtlBench.scenarios.map(_.name))
    val nRows = rows.map(_.getAs[Long]("n_rows")).distinct
    assert(nRows.length === 1 && nRows.head > 0)
    rows.foreach { r =>
      assert(r.getAs[Long]("output_bytes") > 0L)
      assert(r.getAs[Long]("records_per_sec") > 0L)
      assert(r.getAs[Long]("speedup_x100") > 0L)
    }
    val base = rows.find(_.getAs[String]("scenario") == "s1_baseline").get
    assert(base.getAs[Long]("bytes_pct_of_baseline") === 100L)
    assert(base.getAs[Long]("speedup_x100") === 100L)
    // healthy writes use exactly one attempt everywhere, including the
    // recovery-wrapped scenario - its point is that the harness's
    // success-path overhead is ~nothing
    rows.foreach(r => assert(r.getAs[Long]("attempts") === 1L))
  }

  test("writeWithRecovery: retries a transient failure, rethrows a permanent one") {
    import org.apache.spark.sql.functions.udf
    val tmp = java.nio.file.Files.createTempDirectory("etlbench_retry").toString
    val fastPolicy = graft.flight.Flight.RetryPolicy(
      maxAttempts = 3, baseDelayS = 0.001, maxDelayS = 0.002)
    // transient: fails on the first evaluation pass, succeeds after - the
    // wrapper must absorb it and report the attempts used
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    FlakyOnce.trigger = () => calls.incrementAndGet() <= 1
    val flaky = udf((id: Long) =>
      if (FlakyOnce.trigger()) throw new RuntimeException("transient") else id)
    val src = spark.range(0, 10).select(flaky(org.apache.spark.sql.functions.col("id")).as("id"))
    val attempts = EtlBench.writeWithRecovery(
      src, EtlBench.scenarios.head, s"$tmp/transient", fastPolicy)
    assert(attempts >= 2L, s"transient failure was not retried ($attempts)")
    assert(spark.read.parquet(s"$tmp/transient").count() === 10L)
    // permanent: budget spent, the original failure must surface
    FlakyOnce.trigger = () => true
    intercept[Throwable] {
      EtlBench.writeWithRecovery(
        src, EtlBench.scenarios.head, s"$tmp/permanent", fastPolicy)
    }
  }
}

/** Serializable closure state for the flaky-write test (a plain var in the
  * spec would drag the non-serializable suite into the UDF closure). */
object FlakyOnce {
  @volatile var trigger: () => Boolean = () => false
}
