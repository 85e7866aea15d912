package graft

import org.apache.spark.sql.functions._

import graft.analytics.Summaries

/** Mergeable-sketch reaggregation (q75): the estimate from unioned hourly
  * HLL sketches must track the exact per-day distinct count, and the exact
  * aggregates carried alongside must merge losslessly. */
class SummariesSpec extends SparkSpecBase {

  test("q75 unioned hourly sketches estimate daily uniques within 5% of exact") {
    val est = Summaries.q75SketchReagg(spark, Sf001)
      .select(col("day"), col("est_users"))
    val exact = Tables.events(spark, Sf001)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val rows = est.join(exact, "day").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, x) = (r.getAs[Long]("est_users"), r.getAs[Long]("exact_users"))
      assert(math.abs(e - x).toDouble / x <= 0.05, s"day=${r.getString(0)} est=$e exact=$x")
    }
  }

  test("q75 exact counts re-aggregate losslessly through the summary grain") {
    val viaSummary = Summaries.q75SketchReagg(spark, Sf001)
      .select(col("day"), col("n_events"))
    val direct = Tables.events(spark, Sf001)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_direct"))
    val bad = viaSummary.join(direct, "day")
      .filter(col("n_events") =!= col("n_direct")).count()
    assert(bad === 0)
  }
}
