package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Measurement harness for the r15 admission-gate fix: candidate-row
  * counts and warm wall time of [[Similarity.intraBatchDupCandidates]]
  * (digest-grain class collapse) vs the pre-r15 raw signature pair
  * self-join, on batches dominated by one identical-content group — the
  * duplicate-heavy crawl shape an admission gate exists to filter.
  *
  * The batch is `groupSize` copies of one corpus vector plus a diverse
  * remainder of real corpus vectors, so the identical mass sits alongside
  * genuine near-dup structure.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.TimeGate [maxGroup] [skipRawAt]"
  */
object TimeGate {
  def main(args: Array[String]): Unit = {
    val maxGroup = args.headOption.map(_.toInt).getOrElse(10000)
    val skipRawAt = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Similarity.ensureRegistered(spark)

    val planes = 5; val tables = 4; val theta = 0.75
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val x = base.orderBy(col("vec_id")).head()
    val emb = x.getSeq[Float](x.fieldIndex("embedding"))

    def batchOf(groupSize: Int): DataFrame = {
      val group = spark.range(groupSize).select(
        (col("id") + 50000000L).as("vec_id"),
        typedlit(emb.toIndexedSeq).as("embedding"))
      base.filter(col("vec_id") % 3 === 0).unionByName(group)
    }

    // the pre-r15 shape: raw signature pair self-join over the whole batch
    def rawDecisions(clean: DataFrame): DataFrame = {
      val signed = Similarity.indexedRelation(clean, planes, tables)
      val pairs = signed
        .select(col("sig"), col("vec_id").as("i"), col("embedding").as("ei"))
        .join(signed.select(col("sig"), col("vec_id").as("j"),
          col("embedding").as("ej")), Seq("sig"))
        .filter(col("i") < col("j"))
        .select(col("i"), col("j"),
          Similarity.cosine(col("ei"), col("ej")).as("sim_raw"))
        .distinct()
        .filter(col("sim_raw") >= lit(theta))
      pairs.withColumn("rn",
          row_number().over(Window.partitionBy(col("j")).orderBy(col("i"))))
        .filter(col("rn") === 1)
        .select(col("j").as("vec_id"), col("i").as("dup_of"))
    }

    def newDecisions(clean: DataFrame): DataFrame =
      Similarity.intraBatchDupCandidates(clean, planes, tables, theta)
        .withColumn("rn",
          row_number().over(Window.partitionBy(col("vec_id"))
            .orderBy(col("cand_id"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cand_id").as("dup_of"))

    def time[A](label: String)(body: => A): A = {
      body // warm rep
      val t0 = System.nanoTime()
      val r = body
      println(f"$label warm ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }

    var g = 1000
    while (g <= maxGroup) {
      val clean = batchOf(g)
      // candidate-row counts: the quadratic evidence (pre-dedup join rows
      // for raw; emitted candidate rows for digest-grain)
      val signed = Similarity.indexedRelation(clean, planes, tables)
      val rawCand = signed.select(col("sig"), col("vec_id").as("i"))
        .join(signed.select(col("sig"), col("vec_id").as("j")), Seq("sig"))
        .filter(col("i") < col("j")).count()
      val newCand = Similarity
        .intraBatchDupCandidates(clean, planes, tables, theta).count()
      println(s"group=$g raw_join_rows=$rawCand digest_grain_cand_rows=$newCand")
      if (g <= skipRawAt)
        time(s"group=$g raw pair-join decisions")(rawDecisions(clean).count())
      else println(s"group=$g raw pair-join decisions SKIPPED")
      time(s"group=$g digest-grain decisions")(newDecisions(clean).count())
      g *= 10
    }
    spark.stop()
  }
}
