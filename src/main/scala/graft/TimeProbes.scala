package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Measurement harness for the two big-probe-set `max_sim` plans
  * ([[Similarity.maxSimChunkedLadder]] vs [[Similarity.maxSimBroadcastAgg]])
  * at the scale the guard's else-branch actually serves (default 10k probes
  * × 64 dims; sf0.1 embeddings inflated by id-shifted copies). Prints one
  * line per (path, rep) plus a bitwise-equality check between the two
  * paths' outputs. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.TimeProbes [nProbes]"
  */
object TimeProbes {
  def main(args: Array[String]): Unit = {
    val nProbes = args.headOption.map(_.toInt).getOrElse(10000)
    val corpusCopies = args.drop(1).headOption.map(_.toInt).getOrElse(1)
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

    val base = Tables.embeddings(spark, dir)
    val nBase = base.count()
    val copies = math.max(1, (nProbes + nBase - 1) / nBase).toInt
    val probes = (0 until copies)
      .map(i => base.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
      .limit(nProbes)
      .persist()
    probes.count()
    val corpus = (0 until corpusCopies)
      .map(i => base.withColumn("vec_id", col("vec_id") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    val nCorpus = corpus.count()
    println(s"corpus=$nCorpus probes=$nProbes dims=64")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val chk = mk.agg(sum(col("max_sim_raw"))).collect().head.getDouble(0)
        println(f"$label rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"checksum=$chk%.6f")
      }

    time("probes_kernel") {
      Similarity.maxSimProbesKernel(corpus, "embedding", probes, "embedding")
    }
    time("chunked_ladder") {
      Similarity.maxSimChunkedLadder(corpus, "embedding", probes, "embedding")
    }
    time("broadcast_agg") {
      Similarity.maxSimBroadcastAgg(corpus, "vec_id", "embedding",
        probes, "embedding")
    }

    // bitwise equality: kernel vs chunked ladder (the broadcast path was
    // proved equal to the ladder at 10k probes in the r8 run)
    val a = Similarity.maxSimProbesKernel(corpus, "embedding", probes,
      "embedding").select(col("vec_id"), col("max_sim_raw").as("a"))
    val b = Similarity.maxSimChunkedLadder(corpus, "embedding", probes,
      "embedding").select(col("vec_id"), col("max_sim_raw").as("b"))
    val diff = a.join(b, "vec_id").filter(col("a") =!= col("b")).count()
    println(s"bitwise_mismatches=$diff")
    spark.stop()
  }
}
