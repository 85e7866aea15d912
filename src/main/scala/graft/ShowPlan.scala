package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of named SparkEntry
  * queries (the source for PLANS.md sections).
  * Usage: runMain graft.ShowPlan <sfDir> <queryName> [queryName ...] */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"==== $name ====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
