package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan-derived scan-efficiency audit — the Spark-native analog of the
  * reference's partition/projection analyzers
  * (`cost-optimization/query-optimization/query_optimizer.py:276-420`
  * `analyze_partition_efficiency`, `:420+` `analyze_column_projection`).
  *
  * The reference mines Athena query-history metadata (partition_filters
  * used, bytes scanned, columns selected) to score each table's pruning
  * efficiency and recommend filters. Spark exposes the same facts directly
  * in the physical plan: every `FileSourceScanExec` carries its
  * PartitionFilters, PushedFilters, ReadSchema and file statistics — so the
  * audit is a pure plan walk, no history table and no execution required.
  * This is the relation a cost reviewer reads next to q103's spend audit:
  * q103 says WHICH query is expensive, this says WHY its scan is (or is
  * not) prunable.
  *
  * One row per (query, scan): which table, how many of its columns the scan
  * actually reads (column-projection efficiency), whether any filter was
  * pushed to the reader, whether partition pruning applied, and the scan
  * classification the reference's recommender would emit. */
object PlanAudit {

  /** One physical scan's audit row. `col_prune_pct` = share of the table's
    * columns NOT read (pure integer math). `scan_class` ranks the pruning
    * that applied: partition_pruned > filter_pushdown > full_scan.
    * `table_bytes` is the WHOLE table's size (pre-pruning);
    * `scanned_bytes` is the bytes of the files that survive partition
    * pruning — the number the reference's efficiency score is actually
    * about. On an unpartitioned table the two are equal. */
  case class ScanAudit(query_id: String, scan_idx: Int, scan_table: String,
                       n_cols_total: Int, n_cols_read: Int,
                       col_prune_pct: Long, pushed_filters: Boolean,
                       partition_filtered: Boolean, table_bytes: Long,
                       scanned_bytes: Long, scan_class: String)

  /** Audit every parquet scan in `df`'s physical plan (subqueries
    * included). Plan-time only: nothing is executed — `selectedPartitions`
    * is a driver-side file-listing (the same one planning itself performs),
    * not a job. */
  def auditScans(queryId: String, df: DataFrame): Seq[ScanAudit] = {
    val scans = df.queryExecution.sparkPlan.collectWithSubqueries {
      case s: FileSourceScanExec => s
    }
    scans.zipWithIndex.map { case (s, i) =>
      val table = s.relation.location.rootPaths.headOption
        .map(_.getName).getOrElse("?")
      val total = s.relation.dataSchema.size
      val read = s.requiredSchema.size
      val pushed = s.metadata.get("PushedFilters").exists(v =>
        v.nonEmpty && v != "[]")
      val partFiltered = s.partitionFilters.nonEmpty
      val cls =
        if (partFiltered) "partition_pruned"
        else if (pushed) "filter_pushdown"
        else "full_scan"
      val scannedBytes = s.selectedPartitions.totalFileSize
      ScanAudit(queryId, i, table, total, read,
        if (total == 0) 0L else 100L * (total - read) / total,
        pushed, partFiltered, s.relation.location.sizeInBytes, scannedBytes, cls)
    }
  }
}
