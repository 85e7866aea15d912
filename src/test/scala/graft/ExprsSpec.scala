package graft

import org.apache.spark.sql.functions._
import graft.ops.Exprs

class ExprsSpec extends SparkSpecBase {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).head().get(0)

  test("haversineKm: zero for identical points, known JFK-LAX distance") {
    assert(eval1(Exprs.haversineKm(lit(40.0), lit(-73.0), lit(40.0), lit(-73.0)))
      .asInstanceOf[Double] === 0.0)
    // JFK (40.6413,-73.7781) ↔ LAX (33.9416,-118.4085) ≈ 3974 km great-circle
    val d = eval1(Exprs.haversineKm(lit(40.6413), lit(-73.7781), lit(33.9416), lit(-118.4085)))
      .asInstanceOf[Double]
    assert(d > 3950 && d < 4000, s"JFK-LAX haversine out of range: $d")
  }

  test("haversine symmetry") {
    val ab = eval1(Exprs.haversineMi(lit(10.0), lit(20.0), lit(30.0), lit(-40.0))).asInstanceOf[Double]
    val ba = eval1(Exprs.haversineMi(lit(30.0), lit(-40.0), lit(10.0), lit(20.0))).asInstanceOf[Double]
    assert(math.abs(ab - ba) < 1e-9)
  }

  test("bearingOctant: cardinal directions") {
    assert(eval1(Exprs.bearingOctant(lit(0.0), lit(0.0), lit(1.0), lit(0.0))) === "N")
    assert(eval1(Exprs.bearingOctant(lit(0.0), lit(0.0), lit(0.0), lit(1.0))) === "E")
    assert(eval1(Exprs.bearingOctant(lit(0.0), lit(0.0), lit(-1.0), lit(0.0))) === "S")
    assert(eval1(Exprs.bearingOctant(lit(0.0), lit(0.0), lit(0.0), lit(-1.0))) === "W")
  }

  test("gridCell snaps to n-degree grid") {
    assert(eval1(Exprs.gridCell(lit(41.3), 2.0)) === 42.0)
    assert(eval1(Exprs.gridCell(lit(-0.9), 2.0)) === 0.0)
  }

  test("bucketIdx clamps to [0, n-1]") {
    assert(eval1(Exprs.bucketIdx(lit(100.0), lit(0.0), lit(100.0), 10)) === 9)
    assert(eval1(Exprs.bucketIdx(lit(0.0), lit(0.0), lit(100.0), 10)) === 0)
    assert(eval1(Exprs.bucketIdx(lit(55.0), lit(0.0), lit(100.0), 10)) === 5)
  }

  test("dround matches decimal rounding at half boundaries") {
    // 38.75125 is the exact half case that plain round() gets wrong vs DuckDB
    assert(eval1(Exprs.dround(lit(620.02) / 16, 4)) === 38.7513)
    assert(eval1(Exprs.dround(lit(1.005), 2)) === 1.0) // 1.005 double is below half
  }

  test("saltedCountSum matches the direct aggregation") {
    val df = Seq(("hot", 1.0), ("hot", 2.0), ("hot", 3.0), ("cold", 4.0))
      .flatMap { case (k, v) => Seq.fill(25)((k, v)) }
      .toDF("k", "v")
    val salted = Exprs.saltedCountSum(df, col("k"), col("v"), saltBuckets = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = df.groupBy("k").agg(count(lit(1)), sum("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted === direct)
  }

  test("avgExact2 is exact on 2-dp inputs") {
    val df = Seq(6.55, 12.31, 1.63).toDF("v")
    val r = df.agg(Exprs.avgExact2(col("v"), 4)).head().getDouble(0)
    assert(r === 6.83) // (6.55+12.31+1.63)/3 = 20.49/3 = 6.83 exactly
  }
}
