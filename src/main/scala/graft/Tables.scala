package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * All readers take the scale-factor directory so the same query code runs at
  * sf0.001 (smoke), sf0.01 (DuckDB-oracle correctness) and sf0.1 (bench) — and,
  * unchanged, against a cluster-scale partitioned layout (the path is just a
  * parquet directory; partition discovery & pruning are native).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Deterministic synthetic coordinates for the geo operators (q20/q30-q32):
    * lat = value - 50 ∈ [-50, 50], lon = 3.6·k - 180 ∈ [-180, 176.4]. ONE
    * source for the formula — the oracle SQL strings replicate it verbatim,
    * and the stuck/teleport thresholds are tuned against this grid. */
  def withSyntheticPositions(df: DataFrame): DataFrame = df
    .withColumn("lat", col("value") - 50)
    .withColumn("lon",
      get_json_object(col("props"), "$.k").cast("int") * lit(3.6) - 180)

  /** `events.parquet` carries parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects by default. We read nanos as a plain long (legacy conf,
    * runtime-settable) and expose BOTH:
    *   - `ts_ns`: exact epoch-nanos long (DuckDB parity: `epoch_ns(ts)`)
    *   - `ts`:    micro-precision TimestampType for date_trunc/date_format
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
