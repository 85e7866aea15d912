package graft

import org.apache.spark.sql.functions._
import graft.quality.Quality

class QualitySpec extends SparkSpecBase {
  import spark.implicits._

  // crafted rows: (event_id, ts_ns, user_id, event_type, value, props)
  private def mk(rows: (Long, Long, java.lang.Long, String, java.lang.Double, String)*) =
    rows.toDF("event_id", "ts_ns", "user_id", "event_type", "value", "props")

  private val freshNs = (Quality.RefNowEpoch - 30) * 1000000000L // 30 s old

  private def score(df: org.apache.spark.sql.DataFrame) =
    Quality.scoreColumns().foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }

  test("perfect fresh row scores 1.0 and grades A") {
    val r = score(mk((1L, freshNs, 7L, "click", 42.0, """{"k": 1}"""))).head()
    assert(r.getAs[Double]("completeness") === 1.0)
    assert(r.getAs[Double]("validity") === 1.0)
    assert(r.getAs[Double]("consistency") === 1.0)
    assert(r.getAs[Double]("timeliness") === 1.0)
    assert(r.getAs[Double]("quality_score") === 1.0)
    assert(r.getAs[String]("grade") === "A")
    assert(!r.getAs[Boolean]("quarantine"))
    assert(r.getAs[String]("quality_flags") === "")
  }

  test("null critical field tanks completeness; invalid value quarantines") {
    val r = score(mk((1L, freshNs, null, "click", 5000.0, """{"k": 1}"""))).head()
    assert(r.getAs[Double]("completeness") === 0.2) // 1 - 0.8 for null user_id
    assert(r.getAs[Boolean]("quarantine")) // value out of [0,1000]
    assert(r.getAs[String]("quality_flags").contains("INVALID_VALUE"))
  }

  test("consistency contradictions flagged (purchase<=0, error>500)") {
    val rows = score(mk(
      (1L, freshNs, 1L, "purchase", 0.0, """{"k": 1}"""),
      (2L, freshNs, 1L, "error", 600.0, """{"k": 1}"""))).collect()
    assert(rows(0).getAs[String]("quality_flags").contains("PURCHASE_NONPOSITIVE"))
    assert(rows(0).getAs[Double]("consistency") === 0.5)
    assert(rows(1).getAs[String]("quality_flags").contains("ERROR_HIGH_VALUE"))
  }

  test("timeliness decay: fresh=1, 180s≈0.75, stale=0.2") {
    def tl(ageS: Long): Double = {
      val ns = (Quality.RefNowEpoch - ageS) * 1000000000L
      score(mk((1L, ns, 1L, "click", 1.0, """{"k": 1}"""))).head().getAs[Double]("timeliness")
    }
    assert(tl(30) === 1.0)
    assert(tl(180) === 0.75)   // 1 - 120/480
    assert(tl(1000) === 0.5)
    assert(tl(100000) === 0.2)
  }

  test("grade thresholds follow the A>=.95 B>=.85 C>=.70 D>=.50 ladder") {
    // stale row with full marks elsewhere: 0.85*1 + 0.15*0.2 = 0.88 → B
    val r = score(mk((1L, 1000000000L, 1L, "click", 1.0, """{"k": 1}"""))).head()
    assert(r.getAs[Double]("quality_score") === 0.88)
    assert(r.getAs[String]("grade") === "B")
  }

  test("q31 geofence only reports zone violations from inside the boxes") {
    Quality.q31Geofence(spark, Sf001).collect().foreach { r =>
      val (lo, hi) = (r.getAs[Double]("min_lat"), r.getAs[Double]("max_lat"))
      r.getAs[String]("zone") match {
        case "Z1" => assert(lo >= -10 && hi <= 10)
        case "Z2" => assert(lo >= 30 && hi <= 45)
        case "Z3" => assert(lo >= -50 && hi <= -35)
      }
    }
  }
  test("q97 profiles every column in one row each, counts consistent") {
    val rows = graft.quality.BatchChecks.q97SchemaProfile(spark, Sf001).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("n_present") + r.getAs[Long]("n_null") === n)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_present"))
      assert(r.getAs[Long]("null_bp") >= 0L && r.getAs[Long]("null_bp") <= 1000000L)
    }
    val byName = rows.map(r => r.getAs[String]("column_name") -> r).toMap
    // event_id is the PK: fully present, fully distinct
    assert(byName("event_id").getAs[Long]("n_distinct") ===
      byName("event_id").getAs[Long]("n"))
  }

}
