package graft

import org.apache.spark.sql.functions._

class CoreQueriesSpec extends SparkSpecBase {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries entry runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, Sf0001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every queries entry has an oracle or is explicitly rows-only") {
    // ops that are genuinely not DuckDB-reproducible (sketches, seeded
    // hashing, Spark plan metadata)
    val rowsOnly = Set("q15_approx_distinct", "q25_minhash_lsh", "q27_ann_lsh",
      "q37_fingerprints", "q43_ann_ivf", "q46_approx_percentiles",
      "q75_sketch_reagg", "q129_partition_audit", "q131_etl_benchmark",
      "q132_warm_cold_profile", "q147_index_stats",
      "q155_maintenance_schedule")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("q02 percentages sum to ~100") {
    val pct = graft.analytics.CoreQueries.q02BandDistribution(spark, Sf0001)
      .agg(sum(col("pct"))).head().getDouble(0)
    assert(math.abs(pct - 100.0) < 0.01, s"pct sum = $pct")
  }

  test("q04 ranks start at 1 and are bounded by 20") {
    val ranks = graft.analytics.CoreQueries.q04PeakTraffic(spark, Sf0001)
      .select("traffic_rank").collect().map(_.getInt(0))
    assert(ranks.min === 1 && ranks.max <= 20)
  }

  test("q06 anomalies all breach a threshold") {
    val rows = graft.analytics.CoreQueries.q06AnomalyZscore(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(r.fieldIndex("anomaly_flags")).nonEmpty ||
      math.abs(r.getDouble(r.fieldIndex("z_score"))) > 2))
  }
}
