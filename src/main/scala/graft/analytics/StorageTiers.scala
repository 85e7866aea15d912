package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q134: storage-tier recommendations — the reference's S3 lifecycle
  * optimizer (`cost-optimization/s3-lifecycle/s3_lifecycle_optimizer.py`)
  * re-expressed as a relation. The reference walks buckets, classifies each
  * bucket's access pattern from its objects' (access_frequency, age_days)
  * distribution (`recommend_storage_optimization`, :349-406), recommends a
  * storage class with a confidence, and prices current vs projected monthly
  * cost from its per-class $/GB table (:71-81).
  *
  * Spark-native mapping: a "bucket" is an event_type partition family and
  * its "objects" are that family's (event_type, day) partitions, sized by
  * the q103 byte rule. The synthetic corpus spans days, not years, and has
  * no access log, so age_days and access_frequency are PLANTED
  * deterministically from the object's own grain key (the q130
  * latency-plant rule class): age = (13·day + n_rows) mod 500 — crossing
  * the 90/365-day thresholds — and frequency = (n_rows + 3·day) mod 23 —
  * crossing the >10 / ≤1 tiers. A real inventory+access log drops in for
  * `objects` unchanged.
  *
  * The classification ladder and both thresholds are the reference's,
  * evaluated as integer cross-multiplies (never pct-then-compare on
  * doubles); prices ride as micro-USD per GiB-month BIGINTs and every cost
  * is a canonical floor division, so the DuckDB oracle is hash-exact.
  *
  * Scale shape: one map-side-combined aggregation to the object grain, one
  * to the bucket grain, and a presentation sort on a ≤|event types|
  * relation — the same two-stack shape as q133. */
object StorageTiers {

  /** Micro-USD per GiB-month (the reference's price table ×10⁶). */
  val PriceMicroUsdPerGb: Map[String, Long] = Map(
    "STANDARD" -> 23000L,
    "STANDARD_IA" -> 12500L,
    "GLACIER" -> 4000L,
    "DEEP_ARCHIVE" -> 990L,
    "INTELLIGENT_TIERING" -> 22500L)

  def q134StorageTierRecommendations(spark: SparkSession, dir: String): DataFrame = {
    val day = expr("ts_ns div 1000 div 86400000000")
    val objects = Tables.events(spark, dir)
      .groupBy(col("event_type"), day.as("day"))
      .agg(count(lit(1)).as("n_rows"),
        sum(octet_length(col("props")) + 64).as("bytes"))
      .select(col("event_type"), col("bytes"),
        ((col("day") * 13 + col("n_rows")) % 500).as("age_days"),
        ((col("n_rows") + col("day") * 3) % 23).as("access_frequency"))
    storageTiersFrom(objects)
  }

  /** q134 body over an (event_type, bytes, age_days, access_frequency)
    * object inventory — the planted-inventory surface StorageTiersSpec
    * drives every ladder branch through. */
  def storageTiersFrom(objects: DataFrame): DataFrame = {
    val bucket = objects.groupBy(col("event_type").as("bucket"))
      .agg(count(lit(1)).as("total_objects"),
        sum(col("bytes")).as("total_bytes"),
        count(when(col("access_frequency") > 10, 1)).as("frequent_cnt"),
        count(when(col("access_frequency") <= 1, 1)).as("infrequent_cnt"),
        count(when(col("age_days") > 90, 1)).as("old_cnt"),
        count(when(col("age_days") > 365, 1)).as("very_old_cnt"))
    // the reference ladder, thresholds as integer cross-multiplies:
    //   frequent      ⇔ frequent_cnt/total > 0.7
    //   infrequent/archive ⇔ infrequent_cnt/total > 0.6 ∧ old_cnt/total > 0.5
    //     (archive ⇔ additionally very_old_cnt/total > 0.3)
    //   deep_archive  ⇔ very_old_cnt/total > 0.8
    //   else mixed → intelligent tiering
    val classified = bucket
      .withColumn("access_pattern",
        when(col("frequent_cnt") * 10 > col("total_objects") * 7, "frequent")
        .when(col("infrequent_cnt") * 10 > col("total_objects") * 6 &&
              col("old_cnt") * 2 > col("total_objects"),
          when(col("very_old_cnt") * 10 > col("total_objects") * 3, "archive")
            .otherwise("infrequent"))
        .when(col("very_old_cnt") * 10 > col("total_objects") * 8, "deep_archive")
        .otherwise("mixed"))
      .withColumn("recommended_class",
        when(col("access_pattern") === "frequent", "STANDARD")
        .when(col("access_pattern") === "archive", "GLACIER")
        .when(col("access_pattern") === "infrequent", "STANDARD_IA")
        .when(col("access_pattern") === "deep_archive", "DEEP_ARCHIVE")
        .otherwise("INTELLIGENT_TIERING"))
      .withColumn("confidence_pct",
        when(col("access_pattern") === "frequent", 90L)
        .when(col("access_pattern") === "archive", 80L)
        .when(col("access_pattern") === "infrequent", 85L)
        .when(col("access_pattern") === "deep_archive", 90L)
        .otherwise(70L))
    // price both classes per bucket: cost = bytes · $/GiB-month, floor to
    // micro-USD in one canonical division
    val priced = PriceMicroUsdPerGb.foldLeft(classified) { case (d, (cls, micro)) =>
      d.withColumn(s"__$cls",
        expr(s"(total_bytes * ${micro}L) div 1073741824"))
    }
    priced
      .withColumn("current_monthly_microusd", col("__STANDARD"))
      .withColumn("projected_monthly_microusd",
        when(col("recommended_class") === "STANDARD", col("__STANDARD"))
        .when(col("recommended_class") === "GLACIER", col("__GLACIER"))
        .when(col("recommended_class") === "STANDARD_IA", col("__STANDARD_IA"))
        .when(col("recommended_class") === "DEEP_ARCHIVE", col("__DEEP_ARCHIVE"))
        .otherwise(col("__INTELLIGENT_TIERING")))
      .withColumn("monthly_savings_microusd",
        greatest(lit(0L),
          col("current_monthly_microusd") - col("projected_monthly_microusd")))
      .select(col("bucket"), col("total_objects"), col("total_bytes"),
        col("frequent_cnt"), col("infrequent_cnt"), col("old_cnt"),
        col("very_old_cnt"), col("access_pattern"), col("recommended_class"),
        col("confidence_pct"), col("current_monthly_microusd"),
        col("projected_monthly_microusd"), col("monthly_savings_microusd"))
      .orderBy(col("monthly_savings_microusd").desc, col("bucket"))
  }

  val oracle: Map[String, String] = Map(
    "q134_storage_tier_recommendations" ->
      """WITH objects AS (
        |  SELECT event_type,
        |    sum(octet_length(encode(props)) + 64)::BIGINT AS bytes,
        |    ((epoch_us(ts) // 86400000000) * 13 + count(*)) % 500 AS age_days,
        |    (count(*) + (epoch_us(ts) // 86400000000) * 3) % 23
        |      AS access_frequency
        |  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000),
        |bucket AS (
        |  SELECT event_type AS bucket, count(*)::BIGINT AS total_objects,
        |    sum(bytes)::BIGINT AS total_bytes,
        |    count(CASE WHEN access_frequency > 10 THEN 1 END)::BIGINT
        |      AS frequent_cnt,
        |    count(CASE WHEN access_frequency <= 1 THEN 1 END)::BIGINT
        |      AS infrequent_cnt,
        |    count(CASE WHEN age_days > 90 THEN 1 END)::BIGINT AS old_cnt,
        |    count(CASE WHEN age_days > 365 THEN 1 END)::BIGINT AS very_old_cnt
        |  FROM objects GROUP BY event_type),
        |classified AS (
        |  SELECT *,
        |    CASE WHEN frequent_cnt * 10 > total_objects * 7 THEN 'frequent'
        |         WHEN infrequent_cnt * 10 > total_objects * 6
        |              AND old_cnt * 2 > total_objects THEN
        |           CASE WHEN very_old_cnt * 10 > total_objects * 3
        |                THEN 'archive' ELSE 'infrequent' END
        |         WHEN very_old_cnt * 10 > total_objects * 8
        |           THEN 'deep_archive'
        |         ELSE 'mixed' END AS access_pattern
        |  FROM bucket),
        |rec AS (
        |  SELECT *,
        |    CASE access_pattern WHEN 'frequent' THEN 'STANDARD'
        |      WHEN 'archive' THEN 'GLACIER'
        |      WHEN 'infrequent' THEN 'STANDARD_IA'
        |      WHEN 'deep_archive' THEN 'DEEP_ARCHIVE'
        |      ELSE 'INTELLIGENT_TIERING' END AS recommended_class,
        |    (CASE access_pattern WHEN 'frequent' THEN 90 WHEN 'archive' THEN 80
        |      WHEN 'infrequent' THEN 85 WHEN 'deep_archive' THEN 90
        |      ELSE 70 END)::BIGINT AS confidence_pct,
        |    (total_bytes * 23000) // 1073741824 AS current_monthly_microusd,
        |    (total_bytes * (CASE access_pattern WHEN 'frequent' THEN 23000
        |      WHEN 'archive' THEN 4000 WHEN 'infrequent' THEN 12500
        |      WHEN 'deep_archive' THEN 990 ELSE 22500 END)) // 1073741824
        |      AS projected_monthly_microusd
        |  FROM classified)
        |SELECT bucket, total_objects, total_bytes, frequent_cnt,
        |  infrequent_cnt, old_cnt, very_old_cnt, access_pattern,
        |  recommended_class, confidence_pct, current_monthly_microusd,
        |  projected_monthly_microusd,
        |  greatest(0, current_monthly_microusd - projected_monthly_microusd)
        |    AS monthly_savings_microusd
        |FROM rec
        |ORDER BY monthly_savings_microusd DESC, bucket""".stripMargin)
}
