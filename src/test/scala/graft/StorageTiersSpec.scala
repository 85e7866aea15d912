package graft

import graft.analytics.StorageTiers

/** Drives every branch of q134's classification ladder through planted
  * object inventories (the synthetic events plant reaches only some
  * branches at a given SF) and pins the price-table arithmetic. */
class StorageTiersSpec extends SparkSpecBase {

  private val GiB = 1073741824L

  private def tiers(rows: Seq[(String, Long, Long, Long)]) = {
    import spark.implicits._
    StorageTiers.storageTiersFrom(
        rows.toDF("event_type", "bytes", "age_days", "access_frequency"))
      .collect()
      .map(r => r.getAs[String]("bucket") -> r).toMap
  }

  test("classification ladder: every branch reachable, reference precedence") {
    val out = tiers(
      // hot: 8/10 objects accessed >10 times -> frequent/STANDARD
      (1 to 8).map(i => ("hot", GiB, 10L, 15L)) ++
        (1 to 2).map(_ => ("hot", GiB, 10L, 0L)) ++
      // archive: 7/10 untouched, 7/10 old, 4/10 very old -> GLACIER
      // (thresholds are STRICT: 6/10 untouched would not clear >0.6)
      (1 to 4).map(_ => ("arch", GiB, 400L, 0L)) ++
        (1 to 3).map(_ => ("arch", GiB, 100L, 1L)) ++
        (1 to 3).map(_ => ("arch", GiB, 10L, 5L)) ++
      // ia: 7/10 untouched, 6/10 old, only 2/10 very old -> STANDARD_IA
      (1 to 4).map(_ => ("ia", GiB, 100L, 0L)) ++
        (1 to 2).map(_ => ("ia", GiB, 400L, 1L)) ++
        (1 to 1).map(_ => ("ia", GiB, 100L, 1L)) ++
        (1 to 3).map(_ => ("ia", GiB, 10L, 5L)) ++
      // deep: 9/10 very old but ACCESSED (not infrequent) -> DEEP_ARCHIVE
      (1 to 9).map(_ => ("deep", GiB, 400L, 5L)) ++
        Seq(("deep", GiB, 10L, 5L)) ++
      // mixed: nothing dominant -> INTELLIGENT_TIERING
      Seq(("mix", GiB, 10L, 15L), ("mix", GiB, 400L, 0L),
          ("mix", GiB, 50L, 5L), ("mix", GiB, 200L, 12L)))
    assert(out("hot").getAs[String]("recommended_class") === "STANDARD")
    assert(out("hot").getAs[String]("access_pattern") === "frequent")
    assert(out("arch").getAs[String]("recommended_class") === "GLACIER")
    assert(out("ia").getAs[String]("recommended_class") === "STANDARD_IA")
    assert(out("deep").getAs[String]("recommended_class") === "DEEP_ARCHIVE")
    assert(out("deep").getAs[Long]("confidence_pct") === 90L)
    assert(out("mix").getAs[String]("recommended_class") === "INTELLIGENT_TIERING")
    assert(out("mix").getAs[Long]("confidence_pct") === 70L)
    // price table: 10 GiB at STANDARD = $0.23/month = 230_000 micro-USD;
    // GLACIER projection 40_000; savings the difference
    assert(out("arch").getAs[Long]("current_monthly_microusd") === 230000L)
    assert(out("arch").getAs[Long]("projected_monthly_microusd") === 40000L)
    assert(out("arch").getAs[Long]("monthly_savings_microusd") === 190000L)
    // a STANDARD recommendation saves nothing, and never goes negative
    assert(out("hot").getAs[Long]("monthly_savings_microusd") === 0L)
  }

  test("q134 over events: deterministic, savings-ordered, schema stable") {
    val rows = StorageTiers.q134StorageTierRecommendations(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val savings = rows.map(_.getAs[Long]("monthly_savings_microusd")).toSeq
    assert(savings === savings.sorted.reverse)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_objects") > 0L)
      assert(StorageTiers.PriceMicroUsdPerGb.contains(
        r.getAs[String]("recommended_class")))
      assert(r.getAs[Long]("projected_monthly_microusd") <=
        r.getAs[Long]("current_monthly_microusd") ||
        r.getAs[String]("recommended_class") === "INTELLIGENT_TIERING")
    }
  }
}
