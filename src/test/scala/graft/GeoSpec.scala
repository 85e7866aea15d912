package graft

import org.apache.spark.sql.functions._
import graft.geo.Geo

/** q52 airport proximity + q55 corridor classification. */
class GeoSpec extends SparkSpecBase {

  test("q52: per-airport profile respects HAVING, octants partition the count") {
    val rows = Geo.q52AirportProximity(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_nearby")
      assert(n >= 5)
      val octSum = Seq("n_north", "n_south", "n_east", "n_west",
        "n_north_diag", "n_south_diag").map(r.getAs[Long]).sum
      assert(octSum == n, s"octant counts must partition n_nearby: $octSum != $n")
      assert(r.getAs[Double]("min_dist_mi") <= r.getAs[Double]("avg_dist_mi"))
      assert(r.getAs[Double]("avg_dist_mi") <= 450.0)
      assert(r.getAs[Double]("q25_dist_mi") <= r.getAs[Double]("q75_dist_mi"))
    }
  }

  test("q52: nearest-airport step genuinely dedups (some events match 2 boxes)") {
    val ap = Geo.airports(spark, Sf001)
    val e = Tables.withSyntheticPositions(Tables.events(spark, Sf001))
      .filter(col("value") <= 100)
    val cand = e.join(broadcast(ap),
        col("lat").between(col("alat") - 4, col("alat") + 4) &&
        col("lon").between(col("alon") - 12, col("alon") + 12))
      .filter(graft.ops.Exprs.equirectMi(
        col("lat"), col("lon"), col("alat"), col("alon")) <= 450)
    val pairs = cand.count()
    val events = cand.select("event_id").distinct().count()
    assert(pairs > events,
      s"layout must produce multi-airport candidates: pairs=$pairs events=$events")
  }

  test("q52: airport dim is broadcast (no shuffle join against the 25-row dim)") {
    val p = Geo.q52AirportProximity(spark, Sf001)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q55: corridor cells bounded, tracks in [0, 360), rank consistent") {
    val rows = Geo.q55CorridorClassify(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_events") >= 8)
      val h = r.getAs[Double]("avg_heading")
      assert(h >= 0.0 && h < 360.0, s"avg_heading out of range: $h")
      val rc = r.getAs[Double]("route_consistency")
      assert(rc > 0.0 && rc <= 1.0)
    }
    val ranks = rows.map(_.getAs[Int]("corridor_rank"))
    assert(ranks.min == 1)
    // rank ordering must agree with total_events ordering
    val byRank = rows.sortBy(_.getAs[Int]("corridor_rank"))
      .map(_.getAs[Long]("total_events"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }
  test("q89: z-order buckets are tight, disjoint and cover all filtered points") {
    val rows = Geo.q89ZorderLayout(spark, Sf001).collect()
    assert(rows.nonEmpty)
    val buckets = rows.map(_.getAs[Long]("bucket"))
    assert(buckets.toSeq === buckets.sorted.toSeq)
    assert(buckets.distinct.length === buckets.length)
    assert(buckets.forall(b => b >= 0 && b < 64))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cells") <= r.getAs[Long]("bbox_cells"))
      val f = r.getAs[Double]("fill_pct")
      assert(f > 0.0 && f <= 100.0)
      // the point of the layout: a top-6-bit Morton bucket spans at most a
      // 1/8 x 1/8 slice of each quantized axis (128 of 1024 cells per side)
      assert(r.getAs[Long]("lat_span") <= 128, r.toString)
      assert(r.getAs[Long]("lon_span") <= 128, r.toString)
    }
    val total = rows.map(_.getAs[Long]("n")).sum
    val expected = graft.Tables.events(spark, Sf001)
      .filter(org.apache.spark.sql.functions.col("value") <= 100).count()
    assert(total === expected)
  }

}
