package graft

import org.apache.spark.sql.functions._
import graft.analytics.JoinQueries

class JoinQueriesSpec extends SparkSpecBase {

  test("q08 nearest match: each customer contributes to exactly one supplier") {
    val total = JoinQueries.q08NearestMatch(spark, Sf001)
      .agg(sum("n_customers")).head().getLong(0)
    // top-25 suppliers only, so bounded above by customer count
    val nCust = Tables.customer(spark, Sf001).count()
    assert(total <= nCust)
  }

  test("q12 rollup includes grand total row equal to orders count") {
    val rows = JoinQueries.q12RollupOrders(spark, Sf001).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n") === Tables.orders(spark, Sf001).count())
  }

  test("q13 histogram buckets cover all rows and are contiguous-bounded") {
    val rows = JoinQueries.q13PriceHistogram(spark, Sf001).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables.lineitem(spark, Sf001).count())
    assert(rows.forall(r => r.getAs[Double]("bucket_min") <= r.getAs[Double]("bucket_max")))
  }

  test("q15 approx_count_distinct within 5% of exact") {
    JoinQueries.q15ApproxDistinct(spark, Sf001).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("q46 approximate percentiles track the exact values within 5%") {
    graft.analytics.Dashboard.q46ApproxPercentiles(spark, Sf001).collect().foreach { r =>
      Seq(("exact_p50", "approx_p50"), ("exact_p95", "approx_p95")).foreach {
        case (e, a) =>
          val (ev, av) = (r.getAs[Double](e), r.getAs[Double](a))
          assert(math.abs(ev - av) <= math.max(0.05 * math.abs(ev), 1.0),
            s"${r.getString(0)} $a=$av vs $e=$ev")
      }
    }
  }

  test("q51 semi+anti partition the customer set exactly") {
    val rows = JoinQueries.q51SemiAnti(spark, Sf001).collect()
    val total = rows.map(r => r.getAs[Long]("n_with_urgent") + r.getAs[Long]("n_without_urgent")).sum
    assert(total === Tables.customer(spark, Sf001).count())
  }

  test("q07 uses broadcast joins for nation and region dimensions") {
    val plan = JoinQueries.q07SegmentPerformance(spark, Sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast join in plan")
  }
}
