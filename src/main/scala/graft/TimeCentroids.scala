package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Measurement harness for the two centroid-assignment plans
  * ([[Similarity.assignLadder]] literal greatest-ladder vs
  * [[Similarity.assignKernel]] argmax matrix kernel) across the k ladder
  * the r19 VERDICT asked for (256 / 1024 / 4096) — the numbers that size
  * the post-r20 `IndexParams.ivfK` ceiling. Synthetic corpus components
  * are HASH-derived (xxhash64 — the r13 TimeBuckets rule: sin-derived
  * fixtures correlate with the sin-based hyperplane family), centroids are
  * the first k corpus vectors, and each (k, path) cell prints rep1/rep2
  * plus a bitwise ladder↔kernel equality count. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.TimeCentroids [nRows] [k,k,...]"
  */
object TimeCentroids {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(200000)
    // the checksum action NPEs on an empty corpus (sum over zero rows is
    // null) — fail loudly instead, the TimeQ -reps guard rule (r20 ADVICE)
    require(nRows > 0, s"nRows must be > 0, got $nRows")
    val ks = args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(256, 1024, 4096))
    val dims = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Similarity.ensureRegistered(spark)

    // hash-uniform float components in [-0.5, 0.5)
    val comps = (0 until dims).map(p =>
      ((pmod(xxhash64(col("id"), lit(p)), lit(100000L)) / lit(100000.0))
        - lit(0.5)).cast("float"))
    val corpus = spark.range(nRows)
      .select(col("id").as("vec_id"), array(comps: _*).as("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    corpus.count()
    println(s"corpus=$nRows dims=$dims ks=${ks.mkString(",")}")

    def time(label: String)(mk: => DataFrame): Unit =
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val chk = mk.agg(sum(col("cid"))).collect().head.getLong(0)
        println(f"$label rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"checksum=$chk")
      }

    for (k <- ks) {
      // ids are dense 0..nRows, so a filter (not limit — limit after a
      // repartition returns whichever partitions answer first) keeps the
      // centroid set deterministic across runs and ks
      val cents = corpus.filter(col("vec_id") < k).collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1)
      time(s"ladder_k$k") { Similarity.assignLadder(corpus, cents) }
      time(s"kernel_k$k") { Similarity.assignKernel(corpus, cents) }
      val a = Similarity.assignLadder(corpus, cents)
        .select(col("vec_id"), col("cid").as("a"))
      val b = Similarity.assignKernel(corpus, cents)
        .select(col("vec_id"), col("cid").as("b"))
      val diff = a.join(b, "vec_id").filter(col("a") =!= col("b")).count()
      println(s"k=$k bitwise_mismatches=$diff")
    }
    spark.stop()
  }
}
