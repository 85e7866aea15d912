package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable pure-Column expression factories.
  *
  * Everything here stays inside whole-stage codegen (no UDFs): each factory
  * returns a `Column` tree built from `org.apache.spark.sql.functions`.
  *
  * Geo formulas mirror the reference's scalar math:
  *   - haversine km:    reference `src/lambda/etl/data_transformer.py:416-436`
  *   - haversine miles: reference `src/lambda/data_quality/quality_validator.py:732-744`
  *   - equirectangular miles + bearing octant: reference
  *     `sql/athena/05_analytical_queries_part2.sql:165-181`
  *   - grid cells: reference `sql/athena/04_analytical_queries.sql:335-336`
  */
object Exprs {

  val EarthRadiusKm = 6371.0
  val EarthRadiusMi = 3959.0

  /** Great-circle distance between two (lat, lon) points, in km. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    haversine(lat1, lon1, lat2, lon2, EarthRadiusKm)

  /** Great-circle distance in statute miles. */
  def haversineMi(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    haversine(lat1, lon1, lat2, lon2, EarthRadiusMi)

  private def haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
                        radius: Double): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * radius) * asin(sqrt(a))
  }

  /** Planar-approximation distance in miles (cheap pre-filter for range joins;
    * reference 05:165-168: `SQRT(POW(69.1*Δlat,2)+POW(69.1*Δlon*COS(RADIANS(lat)),2))`). */
  def equirectMi(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    sqrt(
      pow(lit(69.1) * (lat2 - lat1), 2) +
      pow(lit(69.1) * (lon2 - lon1) * cos(radians(lat1)), 2))

  /** Initial great-circle bearing from point 1 to point 2 in [0, 360). */
  def bearingDeg(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val y = sin(radians(lon2 - lon1)) * cos(radians(lat2))
    val x = cos(radians(lat1)) * sin(radians(lat2)) -
      sin(radians(lat1)) * cos(radians(lat2)) * cos(radians(lon2 - lon1))
    (degrees(atan2(y, x)) + 360.0) % 360.0
  }

  /** Compass octant (N/NE/.../NW) of the bearing from point 1 to point 2,
    * as a CASE ladder over the angle — reference 05:171-181. */
  def bearingOctant(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val brg = bearingDeg(lat1, lon1, lat2, lon2)
    when(brg < 22.5, "N").when(brg < 67.5, "NE").when(brg < 112.5, "E")
      .when(brg < 157.5, "SE").when(brg < 202.5, "S").when(brg < 247.5, "SW")
      .when(brg < 292.5, "W").when(brg < 337.5, "NW").otherwise("N")
  }

  /** Snap a coordinate to an n-degree grid cell (reference 04:335-336 uses 2°). */
  def gridCell(coord: Column, sizeDeg: Double): Column =
    (round(coord / sizeDeg, 0) * sizeDeg).cast("double")

  /** Equi-width histogram bucket index clamped to [0, nBuckets-1] given
    * global min/max (below-min values land in bucket 0, not -1). */
  def bucketIdx(x: Column, min: Column, max: Column, nBuckets: Int): Column = {
    val w = (max - min) / nBuckets
    greatest(least(floor((x - min) / w), lit(nBuckets - 1)), lit(0)).cast("int")
  }

  /** 100 * x / total, the percent-of-total shape (reference 04:102). */
  def pctOf(x: Column, total: Column, scale: Int = 4): Column =
    dround(lit(100.0) * x / total, scale)

  /** Exact, summation-order-independent sum of a fixed-scale (≤2 dp) double
    * column: cast to decimal first (exact for 2-dp data), sum in decimal,
    * emit double. Plain `sum(double)` differs between engines by 1 ulp
    * depending on partition/accumulation order, which flips `round` at a
    * half boundary (e.g. avg 620.02/16 = 38.75125 exactly). DuckDB parity:
    * `sum(x::DECIMAL(18,2))::DOUBLE`. */
  def sumExact2(c: Column): Column = sumExact(c, 2)

  /** Order-independent average of a 2-dp double column, rounded to `s`.
    * DuckDB parity: `round(sum(x::DECIMAL(18,2))::DOUBLE / count(x), s)`. */
  def avgExact2(c: Column, s: Int): Column = avgExact(c, 2, s)

  /** General fixed-scale exact sum: use the smallest scale that makes the
    * column exact (e.g. 6 for o_totalprice = Σ 2dp×(1+2dp)×(1-2dp) products). */
  def sumExact(c: Column, scale: Int): Column =
    sum(c.cast(s"decimal(25,$scale)")).cast("double")

  def avgExact(c: Column, scale: Int, r: Int): Column =
    dround(sumExact(c, scale) / count(c), r)

  /** The reference's letter-grade ladder over a [0,1] score
    * (quality_validator.py:89-96: A≥.95 B≥.85 C≥.70 D≥.50) — single source
    * for q10/q28/q41; keep oracle SQL CASE ladders in sync with this. */
  def gradeOf(score: Column): Column =
    when(score >= 0.95, "A").when(score >= 0.85, "B")
      .when(score >= 0.70, "C").when(score >= 0.50, "D").otherwise("F")

  /** Two-stage salted aggregation for skewed keys (builder brief: salting).
    * Stage 1 aggregates on (key, salt) — spreading one hot key over
    * `saltBuckets` reducers — stage 2 merges partials per key. Works for any
    * algebraic aggregate expressed as (partial, merge) column pairs; the
    * common count/sum case is provided. At 100 TB this is the fallback when
    * AQE skew-join splitting isn't applicable (aggregation skew, not join
    * skew). */
  def saltedCountSum(df: org.apache.spark.sql.DataFrame, key: Column,
                     valueCol: Column, saltBuckets: Int): org.apache.spark.sql.DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    salted.groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("__c"), sum(valueCol).as("__s"))
      .groupBy(col("k"))
      .agg(sum(col("__c")).as("n"), sum(col("__s")).as("total"))
  }

  /** Double rounding with DuckDB-compatible semantics.
    *
    * DuckDB's `round(x, s)` computes `round(x * 10^s) / 10^s` in binary
    * doubles, while Spark's `round` re-parses the double's shortest decimal
    * representation — the two disagree on values near a half boundary
    * (~3% of already-rounded inputs at s=4). Multiplying first makes Spark
    * reproduce DuckDB bit-for-bit (fuzz-validated on 400k doubles at s=2/4/6),
    * which the oracle hash-compare requires.
    */
  def dround(c: Column, s: Int): Column = {
    val p = math.pow(10, s)
    round(c * p, 0) / p
  }
}
