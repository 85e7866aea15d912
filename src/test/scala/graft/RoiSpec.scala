package graft

import graft.analytics.Roi

/** Drives q135's financial ladder through planted portfolios — the events
  * corpus's savings are micro-scale, so every real row lands Low and the
  * Critical/High/Medium tiers, positive NPV, and the IRR sweep are pinned
  * here. Template used throughout: impl $5000, maint $200/mo, 14 days,
  * 85% confidence (the s3_lifecycle profile). */
class RoiSpec extends SparkSpecBase {

  private def roi(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    Roi.roiFrom(rows.map { case (n, monthly) =>
        (n, "s3_lifecycle", monthly, 5000000000L, 200000000L, 14L, 85L)
      }.toDF("optimization_name", "opt_type", "monthly_savings_microusd",
        "impl_microusd", "maint_microusd", "impl_days", "confidence_pct"))
      .collect().map(r => r.getAs[String]("optimization_name") -> r).toMap
  }

  test("priority tiers, payback, NPV sign and IRR across planted portfolios") {
    val out = roi(Seq(
      "big" -> 10000000000L,    // $10k/mo on a $5k impl: Critical
      "high" -> 439166667L,     // ~55% 5y ROI -> High
      "medium" -> 368333333L,   // ~30% 5y ROI -> Medium
      "never" -> 100000000L,    // $100/mo < $200/mo maintenance: Low
      "zero" -> 0L))            // no savings at all: NULL payback, Low
    assert(out("big").getAs[String]("priority") === "Critical")
    assert(out("high").getAs[String]("priority") === "High")
    assert(out("medium").getAs[String]("priority") === "Medium")
    assert(out("never").getAs[String]("priority") === "Low")
    assert(out("zero").getAs[String]("priority") === "Low")
    // payback: ($5000 + 12·$200) = $7400 at $10k/mo -> 0.74 months
    assert(out("big").getAs[Long]("payback_months_x100") === 74L)
    assert(out("zero").isNullAt(out("zero").fieldIndex("payback_months_x100")))
    // NPV: hugely positive for big, negative when maintenance eats savings
    assert(out("big").getAs[Long]("npv5y_microusd") > 0L)
    assert(out("never").getAs[Long]("npv5y_microusd") < 0L)
    // IRR sweep: big's cash flow repays the investment at ANY rate in the
    // sweep -> capped at 200; a negative cash flow has no IRR at all
    assert(out("big").getAs[Long]("irr_floor_pct") === 200L)
    assert(out("never").isNullAt(out("never").fieldIndex("irr_floor_pct")))
    assert(out("zero").isNullAt(out("zero").fieldIndex("irr_floor_pct")))
  }

  test("IRR floor matches the classic closed-form case") {
    // impl $1000, zero maintenance, $300/yr cash flow for 5 years: the
    // textbook IRR is 15.24%. The discount chain floors every step (it
    // never overstates PV), so the integer sweep may undershoot the true
    // floor by at most 1: accept {14, 15}.
    import spark.implicits._
    val out = Roi.roiFrom(Seq(
        ("classic", "s3_lifecycle", 25000000L, 1000000000L, 0L, 14L, 85L))
      .toDF("optimization_name", "opt_type", "monthly_savings_microusd",
        "impl_microusd", "maint_microusd", "impl_days", "confidence_pct"))
      .collect().head
    val irr = out.getAs[Long]("irr_floor_pct")
    assert(irr === 14L || irr === 15L, s"irr_floor_pct $irr, expected ~15")
  }

  test("IRR sweep includes rate 0: a barely-break-even investment reports 0, not NULL") {
    // $1/mo savings, no maintenance, $59 implementation: NPV at 0% is
    // +$1 (5yr savings $60), NPV at 1% is already under water — the true
    // IRR lives in [0%, 1%), so the floor is 0 and NULL would wrongly say
    // "never breaks even"
    import spark.implicits._
    val out = Roi.roiFrom(Seq(
        ("breakeven", "s3_lifecycle", 1000000L, 59000000L, 0L, 14L, 85L))
      .toDF("optimization_name", "opt_type", "monthly_savings_microusd",
        "impl_microusd", "maint_microusd", "impl_days", "confidence_pct"))
      .collect().head
    assert(out.getAs[Long]("irr_floor_pct") === 0L)
  }

  test("q135 over events: composes q133+q134, deterministic, score-ordered") {
    val rows = Roi.q135RoiPortfolio(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val fams = rows.map(_.getAs[String]("opt_type")).toSet
    assert(fams === Set("query_optimization", "s3_lifecycle"))
    val scores = rows.map(_.getAs[Long]("total_score_x100")).toSeq
    assert(scores === scores.sorted.reverse)
  }
}
