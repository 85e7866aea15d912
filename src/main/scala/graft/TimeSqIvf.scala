package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.{IndexParams, Similarity}

/** Measurement harness for the q154 claim (the q149 cost model, IVF
  * flavor): at an inflated disk-resident corpus, the float IVF layout and
  * the SQ8 layout are built against the SAME frozen centroids (identical
  * routing), and the comparison is (a) layout bytes — the real lever: the
  * quantized partitions are what a 100-TB serving tier stores and reads —
  * and (b) warm probe wall-clock for both serving paths at several batch
  * sizes, where the two-stage rescore's fixed second-action cost is
  * expected to dominate locally (the honest q149 conclusion, re-measured
  * for partition-pruned scans instead of bucket-pruned ones).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.TimeSqIvf [copies]"
  */
object TimeSqIvf {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(40)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Similarity.ensureRegistered(spark)

    def time[A](label: String)(body: => A): A = {
      body
      val t0 = System.nanoTime()
      val r = body
      println(f"$label warm ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }

    val base = Tables.embeddings(spark, dir)
    def rotatedCopy(i: Int): DataFrame = {
      val r = (i * 7) % 64
      val flipped = if (i >= 64) reverse(col("embedding")) else col("embedding")
      val rot = if (r == 0) flipped
        else concat(slice(flipped, r + 1, 64 - r), slice(flipped, 1, r))
      base.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        rot.as("embedding"))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_time_sqivf").toString
    (0 until copies).map(rotatedCopy).reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.parquet(s"$tmp/corpus")
    val corpus = spark.read.parquet(s"$tmp/corpus")
    val n = corpus.count()
    val k = IndexParams.ivfK(n)
    println(s"corpus n=$n k=$k")

    // ONE centroid relation routes both layouts (identical partitions)
    val t0 = System.nanoTime()
    Similarity.ivfCentroids(corpus, k, iters = 2)
      .write.parquet(s"$tmp/float/centroids")
    val cd = spark.read.parquet(s"$tmp/float/centroids")
    val assignedOnce = Similarity.assignToCentroid(corpus, cd)
    assignedOnce.write.partitionBy("cid").parquet(s"$tmp/float/assigned")
    println(f"float layout build ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val t1 = System.nanoTime()
    cd.write.parquet(s"$tmp/sq/centroids")
    corpus.select(posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("pos").as("dim"), col("xf").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .coalesce(1).write.parquet(s"$tmp/sq/stats")
    val stats = spark.read.parquet(s"$tmp/sq/stats").orderBy(col("dim"))
      .collect().map(r => (r.getAs[Double]("mn"), r.getAs[Double]("mx")))
    Similarity.assignToCentroid(corpus, cd)
      .select(col("vec_id"),
        Similarity.quantizeExpr(col("embedding"), stats).as("qcode"), col("cid"))
      .write.partitionBy("cid").parquet(s"$tmp/sq/assigned")
    println(f"sq layout build ${(System.nanoTime() - t1) / 1e9}%.2f s")

    val fB = dirBytes(s"$tmp/float/assigned")
    val qB = dirBytes(s"$tmp/sq/assigned")
    println(f"assigned bytes: float $fB sq $qB ratio ${fB.toDouble / qB}%.2f")

    for (batch <- Seq(2, 8, 32)) {
      val probes = corpus.filter(col("vec_id") % lit(n / batch) === 0)
        .limit(batch)
        .select((col("vec_id") + 900000000L).as("qid"), col("embedding"))
        .cache()
      probes.count()
      time(s"batch=$batch float probeIvf")(
        Similarity.probeIvf(spark, s"$tmp/float", probes, nprobe = 2)
          .agg(sum(col("retrieved_id"))).head().getLong(0))
      time(s"batch=$batch sq probeSqIvf")(
        Similarity.probeSqIvf(spark, s"$tmp/sq", probes, nprobe = 2, corpus)
          .agg(sum(col("retrieved_id"))).head().getLong(0))
      probes.unpersist()
    }
    spark.stop()
  }
}
