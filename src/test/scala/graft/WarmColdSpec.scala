package graft

import org.apache.spark.sql.functions._
import graft.ops.WarmCold

/** Pins q132's structure (rows-only in the driver gate — wall times are
  * machine facts). */
class WarmColdSpec extends SparkSpecBase {

  test("q132: one row per profiled query, sane times and shares") {
    val rows = WarmCold.q132WarmColdProfile(spark, Sf0001).collect()
    assert(rows.map(_.getAs[String]("query_id")).toSeq ===
      Seq("q14_props_json", "q50_arg_extrema", "q53_realtime_metrics"))
    rows.foreach { r =>
      assert(r.getAs[Long]("cold_ms") > 0L)
      assert(r.getAs[Long]("warm_ms") > 0L)
      val wp = r.getAs[Long]("warmup_pct")
      assert(wp >= 0L && wp <= 100L, s"warmup_pct $wp")
      val cg = r.getAs[Long]("codegen_pct")
      assert(cg >= 0L && cg <= 100L, s"codegen_pct $cg")
      assert(r.getAs[Long]("n_ops") > 0L)
    }
    // a plain scan->aggregate pipeline lives substantially inside
    // whole-stage codegen (measured 45% for q50 — scan, partial/final agg
    // and filter in spans; exchanges, sort and take outside); a drop well
    // below that means a span broke
    val q50 = rows.find(_.getAs[String]("query_id") == "q50_arg_extrema").get
    assert(q50.getAs[Long]("codegen_pct") >= 40L,
      s"q50 codegen share ${q50.getAs[Long]("codegen_pct")}")
  }

  test("codegenCounts: spans end at InputAdapter boundaries") {
    // exchange (outside codegen) between two codegen'd spans: the share
    // must be strictly between 0 and 100, not all-or-nothing
    val df = spark.range(0, 1000).groupBy((col("id") % 7).as("k"))
      .agg(sum(col("id")).as("s")).filter(col("s") > 10)
    df.collect()
    val (total, inGen) = WarmCold.codegenCounts(df.queryExecution.executedPlan)
    assert(total > 0 && inGen > 0 && inGen < total, s"($total, $inGen)")
  }
}
