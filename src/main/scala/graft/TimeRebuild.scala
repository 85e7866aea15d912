package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.{IndexParams, Similarity}

/** Measurement harness for the r16 maintenance question: when does the
  * partition-scoped purge ([[Similarity.purgeIvfTombstones]]) beat the
  * full rebuild ([[Similarity.rebuildIvfLayout]]) at paying deletion
  * debt? At an inflated disk-resident corpus, one float IVF layout is
  * cloned per scenario and the wall-clock compared for (a) NARROW debt
  * (~0.1% of rows — the takedown-request shape), (b) WIDE debt (a
  * same-size victim set spread over every partition), and (c) the
  * rebuild, which pays any debt as a side effect but re-runs Lloyd and
  * the full assignment. Expected and measured: purge cost scales with
  * marked-partitions/k, so the purge is the debt tool and the rebuild is
  * only ever motivated by keyspace drift or balance — exactly how the
  * q155 schedule binds them. Numbers in PLANS.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.TimeRebuild [copies]"
  */
object TimeRebuild {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(20)
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

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
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
    val tmp = java.nio.file.Files.createTempDirectory("graft_time_rb").toString
    (0 until copies).map(rotatedCopy).reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.parquet(s"$tmp/corpus")
    val corpus = spark.read.parquet(s"$tmp/corpus")
    val n = corpus.count()
    val k = IndexParams.ivfK(n)
    println(s"corpus n=$n k=$k")

    timed("base layout build (Lloyd + assign)") {
      Similarity.ivfCentroids(corpus, k, iters = 2)
        .write.parquet(s"$tmp/lay/centroids")
      Similarity.assignToCentroid(corpus,
          spark.read.parquet(s"$tmp/lay/centroids"))
        .write.partitionBy("cid").parquet(s"$tmp/lay/assigned")
      "built"
    }

    // clone the layout per scenario (file-level read+write, no re-assign)
    def clone(name: String): String = {
      val d = s"$tmp/$name"
      spark.read.parquet(s"$tmp/lay/centroids").write.parquet(s"$d/centroids")
      spark.read.parquet(s"$tmp/lay/assigned")
        .write.partitionBy("cid").parquet(s"$d/assigned")
      d
    }

    // NARROW debt: ~0.1% of rows — real takedown-request shape. The
    // victims cluster wherever their content routes; count the touched
    // partitions to interpret the scaling.
    val narrowDir = clone("narrow")
    val narrowVictims = corpus.filter(pmod(col("vec_id"), lit(997)) === 0)
    println(s"narrow victims: ${narrowVictims.count()}")
    Similarity.tombstoneIvfRows(spark, narrowDir, narrowVictims)
    val narrowCids = spark.read.parquet(s"$narrowDir/tombstones")
      .select(col("cid")).distinct().count()
    println(s"narrow debt touches $narrowCids of $k partitions")
    timed("purge NARROW debt")(
      Similarity.purgeIvfTombstones(spark, narrowDir))

    // WIDE debt: same victim COUNT, forced into every partition by
    // sampling per-cid from the stored assignment
    val wideDir = clone("wide")
    val assigned = spark.read.parquet(s"$tmp/lay/assigned")
    val perCid = math.max(1L, narrowVictims.count() / k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("vec_id"))
    val wideVictims = assigned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perCid)
      .select(col("vec_id"), col("embedding"))
    println(s"wide victims: ${wideVictims.count()} (~$perCid per cid)")
    Similarity.tombstoneIvfRows(spark, wideDir, wideVictims)
    timed("purge WIDE debt")(
      Similarity.purgeIvfTombstones(spark, wideDir))

    // the REBUILD: pays any debt by exclusion, but re-runs Lloyd + the
    // full assignment — the cost the schedule reserves for keyspace
    // drift / rebalance, never for debt alone
    val rebuildSrc = clone("rb_src")
    Similarity.tombstoneIvfRows(spark, rebuildSrc, narrowVictims)
    timed("rebuildIvfLayout (full Lloyd + assign + publish)") {
      Similarity.rebuildIvfLayout(spark, corpus, rebuildSrc,
        s"$tmp/rb_out", k)
      "rebuilt"
    }
    spark.stop()
  }
}
