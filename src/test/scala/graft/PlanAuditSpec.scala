package graft

import org.apache.spark.sql.functions._

/** Pins q129's plan-derived scan audit (rows-only in the driver gate — the
  * rows are Spark plan facts DuckDB cannot recompute). The assertions state
  * the scan-efficiency contracts the repo already relies on elsewhere:
  * eventsInRange pushdown (q53), join-key IsNotNull pushdown (q07), column
  * pruning on narrow aggregates, and the honest full_scan verdict on a
  * derived-predicate filter (q48). */
class PlanAuditSpec extends SparkSpecBase {

  private def audit = graft.analytics.Dashboard
    .q129PartitionAudit(spark, Sf001).collect()
    .map(r => (r.getAs[String]("query_id"), r.getAs[Int]("scan_idx")) -> r)
    .toMap

  test("q129 audits every query in the set, one row per physical scan") {
    val rows = audit
    assert(rows.keys.map(_._1).toSet === Set(
      "q01_overview", "q03_hourly_trend", "q07_segment_performance",
      "q14_props_json", "q48_quality_filter", "q53_realtime_metrics"))
    // flat test parquet has no hive partitions: partition_filtered must be
    // truthfully false everywhere, every scan has real file bytes, and with
    // nothing pruned the scanned bytes equal the table bytes
    rows.values.foreach { r =>
      assert(!r.getAs[Boolean]("partition_filtered"))
      assert(r.getAs[Long]("table_bytes") > 0L)
      assert(r.getAs[Long]("scanned_bytes") === r.getAs[Long]("table_bytes"))
      assert(r.getAs[Int]("n_cols_read") <= r.getAs[Int]("n_cols_total"))
    }
  }

  test("q53's three range scans all show the eventsInRange pushdown " +
      "contract; q07's four join scans push the join-key IsNotNull") {
    val rows = audit
    (0 to 2).foreach { i =>
      val r = rows(("q53_realtime_metrics", i))
      assert(r.getAs[Boolean]("pushed_filters"), s"scan $i")
      assert(r.getAs[String]("scan_class") === "filter_pushdown", s"scan $i")
    }
    (0 to 3).foreach { i =>
      assert(rows(("q07_segment_performance", i))
        .getAs[Boolean]("pushed_filters"), s"scan $i")
    }
  }

  test("full-table aggregates are honest full_scans but column-pruned; " +
      "a derived-predicate filter (q48) cannot push and says so") {
    val rows = audit
    val q01 = rows(("q01_overview", 0))
    assert(q01.getAs[String]("scan_class") === "full_scan")
    assert(q01.getAs[Long]("col_prune_pct") >= 33L) // reads 3 of 6 columns
    val q14 = rows(("q14_props_json", 0))
    assert(q14.getAs[Long]("col_prune_pct") >= 50L) // reads 2 of 6 columns
    val q48 = rows(("q48_quality_filter", 0))
    assert(q48.getAs[String]("scan_class") === "full_scan")
    assert(q48.getAs[String]("scan_table") === "documents.parquet")
  }

  test("on a partitioned layout the same walk reports partition_pruned") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_paudit").toString
    spark.range(0, 100)
      .withColumn("day", (col("id") % 4).cast("int"))
      .withColumn("v", col("id") * 2)
      .write.partitionBy("day").parquet(s"$tmp/t")
    val q = spark.read.parquet(s"$tmp/t").where(col("day") === 2)
    val rows = graft.ops.PlanAudit.auditScans("part_demo", q)
    assert(rows.length === 1)
    assert(rows.head.partition_filtered)
    assert(rows.head.scan_class === "partition_pruned")
    // the audit's point: scanned bytes reflect the pruning (1 of 4 day
    // partitions survives), table bytes the whole layout
    assert(rows.head.scanned_bytes > 0L)
    assert(rows.head.scanned_bytes < rows.head.table_bytes / 2)
  }
}
