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

  test("MisraGries guarantees: no overcount, undercount <= total/k, heavy " +
      "hitters always survive — under adversarial partitioning") {
    import spark.implicits._
    // 10k rows: three heavies (2000, 1500, 1200), long tail of singletons
    val rng = new scala.util.Random(7)
    val rows = rng.shuffle(
      Seq.fill(2000)("A") ++ Seq.fill(1500)("B") ++ Seq.fill(1200)("C") ++
        (1 to 5300).map(i => s"t$i"))
    val k = 10
    for (parts <- Seq(1, 7, 32)) {
      val ds = rows.toDS().repartition(parts)
      val (counters, total) =
        ds.select(graft.functions.MisraGriesAgg(k).toColumn).head()
      assert(total === 10000L)
      val truth = Map("A" -> 2000L, "B" -> 1500L, "C" -> 1200L).withDefaultValue(1L)
      counters.foreach { case (x, est) =>
        assert(est <= truth(x), s"overcount: $x est=$est true=${truth(x)}")
        assert(truth(x) - est <= total / k,
          s"undercount beyond total/k: $x est=$est true=${truth(x)}")
      }
      // every key above total/k (=1000) must be in the candidate set
      assert(Set("A", "B", "C").subsetOf(counters.keySet),
        s"parts=$parts lost a heavy hitter: ${counters.keySet}")
      assert(counters.size <= k - 1)
    }
  }

  test("q107 emits exactly the keys above total/k with exact counts") {
    val out = Summaries.q107HeavyHitters(spark, Sf001).collect()
    assert(out.nonEmpty, "skewed key construction must produce heavy hitters")
    val total = out.head.getAs[Long]("total")
    // the three hot_ keys absorb ~60% of rows: all and only they pass 5%
    assert(out.map(_.getAs[String]("k")).toSet === Set("hot_0", "hot_1", "hot_2"))
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact") * 20 > total)
    }
    // exact recount matches a plain groupBy on the same key
    val k = when(col("user_id") % 100 < 60,
        concat(lit("hot_"), (col("user_id") % 3).cast("string")))
      .otherwise(concat(lit("u_"), col("user_id").cast("string")))
    val direct = Tables.events(spark, Sf001).groupBy(k.as("k"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact") === direct(r.getAs[String]("k")))
    }
  }

  test("q126 analyzer summary: internally consistent report over the " +
      "planted-corruption corpus") {
    val rows = graft.analytics.Summaries.q126AnalyzerSummary(spark, Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    def v(s: String, m: String) = rows((s, m))
    val total = v("counts", "total")
    assert(total > 0)
    // planted nulls: coverage strictly below total, position ⊆ value
    assert(v("counts", "with_value") < total)
    assert(v("counts", "with_position") <= v("counts", "with_value"))
    // bands partition the non-null values
    assert(v("value_bands", "le_128") + v("value_bands", "128_256") +
      v("value_bands", "256_384") + v("value_bands", "gt_384")
      === v("counts", "with_value"))
    // distribution sanity: min ≤ median ≤ mean-ish ≤ max, std ≥ 0
    assert(v("value_stats", "min") <= v("value_stats", "median"))
    assert(v("value_stats", "median") <= v("value_stats", "max"))
    assert(v("value_stats", "stddev") >= 0)
    // geo ranges ride the synthetic mapping: lat = value − 50
    assert(v("geo", "lat_min") === v("value_stats", "min") - 50)
    assert(v("geo", "lon_min") >= -180 && v("geo", "lon_max") <= 180)
    // top-10s present and bounded
    val sections = rows.keys.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sections("top_types") <= 10 && sections("top_types") >= 1)
    assert(sections("top_k") === 10)
    // timestamps at the micro grain, exactly representable in double
    assert(v("meta", "ts_min_us") <= v("meta", "ts_max_us"))
  }
}
