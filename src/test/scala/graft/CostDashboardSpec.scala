package graft

import graft.analytics.Dashboard

/** Drives q137's alert-severity bands and change arithmetic through planted
  * spend logs — the synthetic corpus reaches only some bands at a given SF.
  * Budget and forecast multiplier are name-derived plants:
  * budget = 500 + (len·137)%1500, forecast = spend·(100+(len·53)%100)/100.
  * Service names below are CHOSEN for their lengths: len 2 → budget 774,
  * forecast ×1.06 (medium reachable); len 1 → budget 637, ×1.53. */
class CostDashboardSpec extends SparkSpecBase {

  /** cost_microusd = (bytes·5e6) div 2^30: ~214.75 bytes per micro-USD. */
  private def bytesFor(costMicro: Long): Long = costMicro * 1073741824L / 5000000L + 1

  private def dash(rows: Seq[(String, Long, Long, Long)]) = {
    import spark.implicits._
    Dashboard.costDashboardFrom(
        rows.toDF("event_type", "day", "n_rows", "bytes"))
      .collect().map(r => r.getAs[String]("service") -> r).toMap
  }

  test("severity bands: critical via spend and via forecast, high, medium, " +
      "none; negative change; cost-per-million") {
    // day 6 is current (max_day 6, window >= 3); day 0 is previous
    val out = dash(Seq(
      // "aa": budget 774, forecast x1.06. spend 95% -> critical(spend)
      ("aa", 6L, 1000L, bytesFor(740L)), ("aa", 0L, 1000L, bytesFor(1480L)),
      // "bb": spend 70% -> forecast 74 -> medium
      ("bb", 6L, 1000L, bytesFor(545L)), ("bb", 0L, 1000L, bytesFor(100L)),
      // "cc": spend 85% -> forecast 90 -> high (spend < 90, forecast < 100)
      ("cc", 6L, 1000L, bytesFor(660L)), ("cc", 0L, 1000L, bytesFor(660L)),
      // "dd": spend 30% -> none
      ("dd", 6L, 1000L, bytesFor(235L)), ("dd", 0L, 1000L, bytesFor(235L)),
      // "a": budget 637, forecast x1.53. spend 69% -> forecast 105 ->
      // critical via FORECAST while spend is far under 90
      ("a", 6L, 1000L, bytesFor(440L)), ("a", 0L, 1000L, bytesFor(440L))))
    assert(out("aa").getAs[String]("severity") === "critical")
    assert(out("bb").getAs[String]("severity") === "medium")
    assert(out("bb").getAs[String]("alert_type") === "early_warning")
    assert(out("cc").getAs[String]("severity") === "high")
    assert(out("cc").getAs[String]("alert_type") === "approaching_limit")
    assert(out("dd").getAs[String]("severity") === "none")
    assert(out("a").getAs[String]("severity") === "critical")
    assert(out("a").getAs[String]("alert_type") === "forecast_exceeded")
    // "aa" halved its spend: change = -50% (sign-split half-up)
    assert(out("aa").getAs[Long]("change_x100") === -5000L)
    // "dd" flat: change 0
    assert(out("dd").getAs[Long]("change_x100") === 0L)
    // cost per million records: 1000 current records carrying ~235 micro
    val cpm = out("dd").getAs[Long]("cost_per_million_microusd")
    assert(cpm === out("dd").getAs[Long]("cur_cost_microusd") * 1000L)
  }

  test("q137 over events: deterministic, spend-ordered, all bands legal") {
    val rows = Dashboard.q137CostDashboard(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val costs = rows.map(_.getAs[Long]("cur_cost_microusd")).toSeq
    assert(costs === costs.sorted.reverse)
    rows.foreach { r =>
      assert(Set("critical", "high", "medium", "none")(
        r.getAs[String]("severity")))
      assert(r.getAs[Long]("budget_microusd") >= 500L)
    }
  }
}
