package graft

import org.apache.spark.sql.functions._
import graft.analytics.Dashboard

/** Drives q133's strategy ladder and recommendation cut through planted
  * logs — the synthetic events log exercises only the cheap tier, so the
  * thresholds (avg cost > $10, avg exec > 60s, savings > $10/month) are
  * pinned here against hand-computed expectations. */
class CacheRecsSpec extends SparkSpecBase {

  private def recs(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    Dashboard.cacheRecommendationsFrom(
        rows.toDF("event_type", "bytes", "millis"))
      .collect()
      .map(r => r.getAs[String]("query_pattern") -> r).toMap
  }

  test("strategy ladder: cost tier beats time tier beats default; " +
      "hit-rate tiers follow frequency; the $10 cut flags correctly") {
    val gb3 = 3L * 1073741824L // 3 GiB per execution -> avg cost $15
    val out = recs(
      // expensive: 2 executions, avg cost > $10 -> redis, freq 2 -> 40%
      Seq(("expensive", gb3, 1000L), ("expensive", gb3, 1000L)) ++
      // slow: 5 executions, cheap but avg 90s -> elasticache, freq 5 -> 60%
      (1 to 5).map(_ => ("slow", 1000L, 90000L)) ++
      // chatty: 12 cheap fast executions -> app-level, freq 12 -> 80%
      (1 to 12).map(_ => ("chatty", 1000L, 100L)) ++
      // unique: a single execution must not appear at all
      Seq(("unique", 1000L, 100L)))
    assert(out.keySet === Set("expensive", "slow", "chatty"))
    assert(out("expensive").getAs[String]("cache_strategy") === "redis_ttl_freshness")
    assert(out("expensive").getAs[Long]("est_hit_rate_pct") === 40L)
    assert(out("slow").getAs[String]("cache_strategy") === "elasticache_24h_ttl")
    assert(out("slow").getAs[Long]("est_hit_rate_pct") === 60L)
    assert(out("chatty").getAs[String]("cache_strategy") === "app_level_1h_ttl")
    assert(out("chatty").getAs[Long]("est_hit_rate_pct") === 80L)
    // expensive: total 6 GiB -> monthly = 6GiB*40*200000/2^30 micro-USD
    //          = 6*40*200000 = 48_000_000 micro-USD = $48 -> recommended
    assert(out("expensive").getAs[Long]("monthly_savings_microusd") === 48000000L)
    assert(out("expensive").getAs[Boolean]("recommended"))
    // chatty: 12 KB total -> far under the $10/month cut
    assert(!out("chatty").getAs[Boolean]("recommended"))
    // avg cost for expensive: 6 GiB * $5/GiB / 2 = $15 = 15_000_000 micro
    assert(out("expensive").getAs[Long]("avg_cost_microusd") === 15000000L)
  }

  test("q133 over the events log: deterministic rows, savings-ordered") {
    val rows = Dashboard.q133CacheRecommendations(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val savings = rows.map(_.getAs[Long]("monthly_savings_microusd")).toSeq
    assert(savings === savings.sorted.reverse, "not ordered by savings desc")
    rows.foreach { r =>
      assert(r.getAs[Long]("frequency") >= 2L)
      assert(Set("redis_ttl_freshness", "elasticache_24h_ttl",
        "app_level_1h_ttl")(r.getAs[String]("cache_strategy")))
    }
  }
}
