package graft

import org.apache.spark.sql.SparkSession

/** Per-round warm-ledger recorder (r11) — run once per round after the
  * bench, then commit the new `round=<r>` partition:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.WarmLedgerCli \
  *     /root/testdata/sf0.1 r11 bench/warm_ledger"
  *
  * Prints the round's profile and the cross-round regression view
  * ([[graft.ops.WarmLedger.regressions]]) — the table the next round diffs
  * instead of re-litigating cold bench times. */
object WarmLedgerCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: WarmLedgerCli <sfDir> <round> [ledgerDir]")
    val Array(dir, round) = args.take(2)
    val ledgerDir = if (args.length > 2) args(2) else "bench/warm_ledger"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.WarmLedger.record(spark, dir, round, ledgerDir)
      .show(100, truncate = false)
    graft.ops.WarmLedger.regressions(spark, ledgerDir)
      .show(100, truncate = false)
    spark.stop()
  }
}
