package graft

import org.apache.spark.sql.functions._
import graft.ts.TimeSeries

class TimeSeriesSpec extends SparkSpecBase {
  import spark.implicits._

  // (key, t, v) — nulls are the gaps to fill
  private def frame = Seq(
    ("a", 0L, Some(10.0)), ("a", 10L, None), ("a", 20L, None), ("a", 40L, Some(50.0)),
    ("a", 50L, None), // trailing gap
    ("b", 0L, None),  // leading gap
    ("b", 10L, Some(4.0)),
    ("c", 0L, None)   // all-null key
  ).toDF("k", "t", "v")

  test("interpolateLinear: interior gaps are time-weighted, edges clamp to nearest anchor") {
    val out = frame.withColumn("vi",
        TimeSeries.interpolateLinear(Seq(col("k")), Seq(col("t")), col("t"), col("v")))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val expected = Seq(
      ("a", 0L, Some(10.0)),
      ("a", 10L, Some(20.0)),  // 10 + (50-10) * 10/40
      ("a", 20L, Some(30.0)),  // 10 + (50-10) * 20/40
      ("a", 40L, Some(50.0)),
      ("a", 50L, Some(50.0)),  // trailing → previous anchor
      ("b", 0L, Some(4.0)),    // leading → next anchor
      ("b", 10L, Some(4.0)),
      ("c", 0L, None)          // nothing to anchor on
    )
    assert(out.toSeq === expected)
  }

  test("forwardFill and backwardFill") {
    val out = frame
      .withColumn("ff", TimeSeries.forwardFill(Seq(col("k")), Seq(col("t")), col("v")))
      .withColumn("bf", TimeSeries.backwardFill(Seq(col("k")), Seq(col("t")), col("v")))
      .orderBy("k", "t").collect()
    def d(r: org.apache.spark.sql.Row, i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
    val ff = out.map(d(_, 3)).toSeq
    val bf = out.map(d(_, 4)).toSeq
    assert(ff === Seq(Some(10.0), Some(10.0), Some(10.0), Some(50.0), Some(50.0), None, Some(4.0), None))
    assert(bf === Seq(Some(10.0), Some(50.0), Some(50.0), Some(50.0), None, Some(4.0), Some(4.0), None))
  }

  test("dedupKeep strategies: first, last, best") {
    val df = Seq(
      ("k1", 1L, 5.0), ("k1", 2L, 9.0), ("k1", 3L, 7.0),
      ("k2", 1L, 2.0)
    ).toDF("k", "t", "q")
    def ids(order: Seq[org.apache.spark.sql.Column]) =
      TimeSeries.dedupKeep(df, Seq(col("k")), order)
        .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ids(Seq(col("t"))) === Seq(("k1", 1L), ("k2", 1L)))            // keep-first
    assert(ids(Seq(col("t").desc)) === Seq(("k1", 3L), ("k2", 1L)))       // keep-last
    assert(ids(Seq(col("q").desc, col("t"))) === Seq(("k1", 2L), ("k2", 1L))) // keep-best
  }

  test("asofJoin: latest-at-or-before semantics, exact-ts tie included, null when none") {
    val right = Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (2L, 50L, 500.0))
      .toDF("user_id", "t", "rv")
    val left = Seq(
      (11L, 1L, 5L),   // before any right row → null
      (12L, 1L, 10L),  // exact tie with right t=10 → 100.0 (ASOF >=)
      (13L, 1L, 15L),  // between → 100.0
      (14L, 1L, 99L),  // after all → 200.0 (latest, not first)
      (15L, 2L, 60L),  // other key isolated → 500.0
      (16L, 3L, 60L)   // key with no right rows → null
    ).toDF("event_id", "user_id", "t")
    val out = TimeSeries.asofJoin(left, right, Seq("user_id"), "t", Seq("rv"))
      .orderBy("event_id").collect()
    val got = out.map(r =>
      if (r.isNullAt(r.fieldIndex("asof_rv"))) None
      else Some(r.getAs[Double]("asof_rv"))).toSeq
    assert(got === Seq(None, Some(100.0), Some(100.0), Some(200.0), Some(500.0), None))
  }

  test("bucketedRangeJoin: inclusive bounds, multi-bucket intervals, no dup matches") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 31L), (5L, 100L))
      .toDF("pid", "t")
    // [10, 30] spans buckets 1..3 at width 10; [28, 32] overlaps it
    val intervals = Seq(("A", 10L, 30L), ("B", 28L, 32L)).toDF("iid", "s", "e")
    val out = TimeSeries.bucketedRangeJoin(points, intervals, "t", "s", "e", 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // t=10 and t=25 in A (bounds inclusive); t=31 in B only; t=25... t=28..30
    // overlap region has no point; t=5/100 match nothing
    assert(out === Set((2L, "A"), (3L, "A"), (4L, "B")))
    // a point inside BOTH intervals matches each exactly once
    val p2 = Seq((9L, 29L)).toDF("pid", "t")
    val both = TimeSeries.bucketedRangeJoin(p2, intervals, "t", "s", "e", 10L)
      .select("iid").collect().map(_.getString(0)).sorted.toSeq
    assert(both === Seq("A", "B"))
  }

  test("dedupKeep is idempotent") {
    val df = Seq(
      ("k1", 1L, 5.0), ("k1", 2L, 9.0), ("k2", 1L, 2.0), ("k2", 9L, 2.0)
    ).toDF("k", "t", "q")
    val once = TimeSeries.dedupKeep(df, Seq(col("k")), Seq(col("q").desc, col("t")))
    val twice = TimeSeries.dedupKeep(once, Seq(col("k")), Seq(col("q").desc, col("t")))
    assert(once.collect().sortBy(_.getString(0)).toSeq ===
      twice.collect().sortBy(_.getString(0)).toSeq)
  }

  test("q18 interpolation leaves no nulls when every user has an anchor (sf0.001)") {
    val out = TimeSeries.q18Interpolate(spark, Sf0001)
    assert(out.filter(col("sum_interp").isNull).count() === 0)
  }

  test("q20 cumulative distance is nonnegative and max leg <= total") {
    TimeSeries.q20CumDistance(spark, Sf0001).collect().foreach { r =>
      val total = r.getAs[Double]("total_km")
      val maxLeg = r.getAs[Double]("max_leg_km")
      assert(total >= 0 && maxLeg <= total + 1e-9, s"user ${r.get(0)}: $maxLeg > $total")
    }
  }
}
