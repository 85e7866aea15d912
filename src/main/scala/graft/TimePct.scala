package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement harness: per-band percentile relation over lineitem,
  * two-pass (Pct.relation × 2 + join) vs one-pass stacked
  * (Pct.relationStacked). Run: TimePct <sfDir> [reps]. Prints per-rep
  * seconds and a checksum so Catalyst can't prune the work; alternates
  * variants within the same session so JIT/IO warmup cancels. */
object TimePct {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Pct

    def banded: DataFrame = Tables.lineitem(spark, sfDir)
      .withColumn("price_band",
        when(col("l_extendedprice") < 1000, "XS")
          .when(col("l_extendedprice") < 5000, "S")
          .when(col("l_extendedprice") < 20000, "M")
          .when(col("l_extendedprice") < 50000, "L")
          .otherwise("XL"))
    def twoPass: DataFrame =
      Pct.relation(banded, Seq("price_band"), "l_discount",
          Seq("mdisc" -> 0.5))
        .join(Pct.relation(banded, Seq("price_band"), "l_extendedprice",
          Seq("p95p" -> 0.95)), "price_band")
    def stacked: DataFrame =
      Pct.relationStacked(banded, Seq("price_band"), Seq(
        "l_discount" -> Seq("mdisc" -> 0.5),
        "l_extendedprice" -> Seq("p95p" -> 0.95)))

    def time(tag: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val d = df
      val n = d.select(xxhash64(struct(d.columns.toIndexedSeq.map(col): _*)))
        .collect().length
      println(f"TIMEPCT $tag ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    // warmup both
    time("warm2", twoPass); time("warmS", stacked)
    (1 to reps).foreach { r =>
      time(s"two_pass rep$r", twoPass)
      time(s"stacked  rep$r", stacked)
    }
    spark.stop()
  }
}
