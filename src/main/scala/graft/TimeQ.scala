package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries in isolation (2 reps — rep1 shows JIT/codegen
  * cold-start, rep2 the steady state), same checksum action as Bench.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.TimeQ /root/testdata/sf0.1 q24_ngram_jaccard"
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => }
    import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}
    names.foreach { n =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
          .agg(bit_xor(col("h"))).collect()
        println(f"TIMEQ $n rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
