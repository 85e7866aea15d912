package graft

import graft.analytics.FnSizing

/** Drives every branch of q136's memory / duration / concurrency /
  * cold-start ladders through planted function metrics, and pins the
  * cost-model and performance-model arithmetic. */
class FnSizingSpec extends SparkSpecBase {

  private def size(rows: Seq[(String, Long, Long, Long, Long, Long, Long, Long, Long)]) = {
    import spark.implicits._
    FnSizing.rightsizeFrom(rows.toDF("function_name", "invocations",
        "avg_duration_ms", "current_memory_mb", "avg_memory_used_mb",
        "max_memory_used_mb", "max_concurrent", "throttles", "cold_start_pct"))
      .collect().map(r => r.getAs[String]("function_name") -> r).toMap
  }

  test("memory ladder: raise on hot, shrink toward max-used on cold, " +
      "duration heuristics when unmetered; caps hold") {
    val out = size(Seq(
      // 90% utilized 1024MB -> 1.5x = 1536, confidence 90
      ("hot", 1000L, 5000L, 1024L, 922L, 1000L, 50L, 0L, 5L),
      // 10% utilized 1024MB -> 1.2x max-used(200) = 240, confidence 80
      ("cold", 1000L, 5000L, 1024L, 102L, 200L, 50L, 0L, 5L),
      // hot at the 10240 cap: 8192*1.5 clamps to 10240
      ("capped", 1000L, 5000L, 8192L, 8000L, 8100L, 50L, 0L, 5L),
      // unmetered + >30s duration -> memory doubles, confidence 30
      ("slowfn", 1000L, 45000L, 512L, 0L, 0L, 50L, 0L, 5L),
      // unmetered + <1s -> 0.7x, floor at 128
      ("fastfn", 1000L, 500L, 128L, 0L, 0L, 50L, 0L, 5L),
      // 50% utilization: already optimal, unchanged
      ("okfn", 1000L, 5000L, 512L, 256L, 300L, 50L, 0L, 5L)))
    assert(out("hot").getAs[Long]("recommended_memory_mb") === 1536L)
    assert(out("hot").getAs[Long]("memory_confidence_pct") === 90L)
    assert(out("cold").getAs[Long]("recommended_memory_mb") === 240L)
    assert(out("cold").getAs[Long]("memory_confidence_pct") === 80L)
    assert(out("capped").getAs[Long]("recommended_memory_mb") === 10240L)
    assert(out("slowfn").getAs[Long]("recommended_memory_mb") === 1024L)
    assert(out("slowfn").getAs[Long]("memory_confidence_pct") === 30L)
    assert(out("fastfn").getAs[Long]("recommended_memory_mb") === 128L)
    assert(out("okfn").getAs[Long]("recommended_memory_mb") === 512L)
    // performance model: hot 1024->1536 = +min(300, 0.5*200*... ) = +100/1000
    assert(out("hot").getAs[Long]("perf_improvement_x1000") === 100L)
    // cold 1024->240 shrink: -min(100, ((1024-240)*50)/240=163) = -100
    assert(out("cold").getAs[Long]("perf_improvement_x1000") === -100L)
    // projected duration applies the model: 5000*(1000-100)/1000 = 4500
    assert(out("hot").getAs[Long]("projected_duration_ms") === 4500L)
    assert(out("cold").getAs[Long]("projected_duration_ms") === 5500L)
    // shrinking memory must cut the duration bill
    assert(out("cold").getAs[Long]("cost_change_picousd") < 0L)
  }

  test("concurrency and cold-start ladders") {
    val out = size(Seq(
      // throttled: reserve 2x peak (and at least 10)
      ("throttled", 1000L, 5000L, 512L, 256L, 300L, 80L, 3L, 25L),
      ("tinythrottled", 1000L, 5000L, 512L, 256L, 300L, 2L, 1L, 15L),
      // high concurrency, never throttled: 0.7x peak provisioned
      ("busy", 1000L, 5000L, 512L, 256L, 300L, 200L, 0L, 8L),
      // low concurrency: nothing to do
      ("quiet", 1000L, 5000L, 512L, 256L, 300L, 40L, 0L, 3L)))
    assert(out("throttled").getAs[Long]("recommended_concurrency") === 160L)
    assert(out("tinythrottled").getAs[Long]("recommended_concurrency") === 10L)
    assert(out("busy").getAs[Long]("recommended_concurrency") === 140L)
    assert(out("quiet").getAs[Long]("recommended_concurrency") === 0L)
    assert(out("quiet").getAs[Long]("concurrency_cost_picousd") === 0L)
    // provisioned bill: 140 * 4166700 * 730 pico-USD
    assert(out("busy").getAs[Long]("concurrency_cost_picousd") ===
      140L * 4166700L * 730L)
    assert(out("throttled").getAs[String]("cold_start_priority") === "high")
    assert(out("throttled").getAs[Long]("cold_start_improvement_x1000") === 600L)
    assert(out("tinythrottled").getAs[String]("cold_start_priority") === "medium")
    assert(out("quiet").getAs[String]("cold_start_priority") === "low")
  }

  test("monthly cost model: 1024MB x 1000ms x 1 invocation = exactly " +
      "1 GB-second (divisor 1024000, not 1048576000)") {
    // 7 weekly invocations -> monthly = 7*120 div 7 = 120; 50% utilization
    // keeps recommended == current so both cost columns use the same memory.
    // Each 1024MB x 1000ms invocation is exactly 1 GB-s = 16666700 picoUSD,
    // plus the 200000 picoUSD request price.
    val out = size(Seq(("gbsec", 7L, 1000L, 1024L, 512L, 600L, 50L, 0L, 5L)))
    assert(out("gbsec").getAs[Long]("recommended_memory_mb") === 1024L)
    assert(out("gbsec").getAs[Long]("current_monthly_cost_picousd") ===
      120L * (200000L + 16666700L))
    assert(out("gbsec").getAs[Long]("cost_change_picousd") === 0L)
  }

  test("q136 over events: one row per function, sane costs") {
    val rows = FnSizing.q136FunctionRightsizing(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("current_monthly_cost_picousd") > 0L)
      assert(r.getAs[Long]("recommended_memory_mb") >= 128L)
      assert(r.getAs[Long]("recommended_memory_mb") <= 10240L)
    }
  }
}
