package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-inspection tool: print the formatted physical plan for named
  * `SparkEntry.queries` entries (or every query when none named).
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.01 q59_dup_clusters ..."
  *
  * `SPARK_GRAFT_AQE_FINAL=1` additionally executes each query and prints
  * the AQE-finalized plan, which shows runtime join strategy changes and
  * skew splits that the static plan hides. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picked =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else names.map(n => n -> SparkEntry.queries(n))
    picked.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      println(s"\n===== $name =====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      if (sys.env.contains("SPARK_GRAFT_AQE_FINAL")) {
        df.collect()
        println(s"----- $name (AQE final) -----")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
