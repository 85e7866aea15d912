package graft
import org.apache.spark.sql.SparkSession
/** Dev tool (r10): warm/cold + codegen share for ad-hoc query sets via the
  * q132 profiler — `sbt "runMain graft.TimeTop /root/testdata/sf0.1 q118_… …"`. */
object TimeTop {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => }
    graft.ops.WarmCold.warmColdProfile(spark, args.head, args.tail.toSeq)
      .show(100, truncate = false)
    spark.stop()
  }
}
