package graft
/** Dev tool (r10): count FINAL-plan parquet scans for named queries —
  * AdaptiveSparkPlan.toString appends an "Initial Plan" section that
  * double-counts naive string matching; this splits it off. Caught q137
  * recomputing its fact aggregation per consumer and q135 paying 4 scans. */
object ShowScans {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      val finalPlan = full.split("== Initial Plan ==").head
      println(s"SCANS $n final=" + "Scan parquet".r.findAllIn(finalPlan).length +
        " reuse=" + finalPlan.contains("ReusedExchange"))
    }
    spark.stop()
  }
}
