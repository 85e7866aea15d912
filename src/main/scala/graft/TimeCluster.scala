package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase decomposition of the dup-cluster family (q59/q104/q114/
  * q115/q117/q118/q122 all pay jaccardPairs + clusterLabels before their
  * own rollup). Times, warm (rep2 of each phase):
  *
  *   A. shingleRows(docs,3).distinct()        — the exploded relation
  *   B. jaccardPairs(docs,3)                  — pair relation (noop-forced)
  *   C. propagationEdges(pairs)               — edges checkpoint (forces B)
  *   D. propagateToFixpoint(edges, identity)  — loop rounds + round count
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.TimeCluster /root/testdata/sf0.1"
  */
object TimeCluster {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => }
    // stage-level accounting: wall duration + summed task run time per stage
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          stages.add(f"    stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
            f"wall=${wall.getOrElse(-1L)}%5d ms " +
            f"taskTime=${si.taskMetrics.executorRunTime}%5d ms  ${si.name.take(60)}")
        }
      })
    def drainStages(): Unit = {
      var s = stages.poll()
      while (s != null) { println(s); s = stages.poll() }
    }
    import graft.text.TextOps
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMECLUSTER $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { rep =>
      val docs = Tables.documents(spark, sfDir)
      if (rep == 1) {
        val sh = TextOps.shingleRows(docs, 3)
        val d = sh.distinct()
        val dfc = d.groupBy(col("s")).count()
        val joinRows = dfc.filter(col("count") <= 500)
          .agg(sum(col("count") * (col("count") - 1) / 2)).head().get(0)
        println(s"TIMECLUSTER sizes exploded=${sh.count()} " +
          s"distinct=${d.count()} shingles=${dfc.count()} joinRows=$joinRows")
      }
      time(s"A_shingle_distinct rep$rep") {
        noop(TextOps.shingleRows(docs, 3).distinct())
      }
      drainStages()
      val bDf = TextOps.jaccardPairs(docs, 3)
      time(s"B_jaccardPairs rep$rep") { bDf.queryExecution.toRdd.count() }
      if (rep == 2) {
        drainStages()
        // walk the AQE-final plan (stage wrappers hang their materialized
        // subtree off .plan — the r10 lesson) and print per-operator metrics
        def walk(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
          val ms = p.metrics.map { case (k, m) => s"$k=${m.value}" }
            .mkString(" ").take(140)
          println("  " * d + s"OP ${p.nodeName}  $ms")
          p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              walk(a.executedPlan, d + 1)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              walk(q.plan, d + 1)
            case _ => p.children.foreach(walk(_, d + 1))
          }
        }
        walk(bDf.queryExecution.executedPlan, 0)
      }
      val edges = time(s"C_edges_checkpoint rep$rep") {
        TextOps.propagationEdges(TextOps.jaccardPairs(docs, 3))
      }
      val init = time(s"C2_init_checkpoint rep$rep") {
        // mirrors clusterLabels' r21 1-hop-min seed
        TextOps.checkpointKeepPartitioning(
          edges.select(col("src").as("doc_id"), col("dst"))
            .groupBy(col("doc_id")).agg(min(col("dst")).as("nmin")))
          .select(col("doc_id"),
            least(col("doc_id"), col("nmin")).as("label"))
      }
      val (labels, rounds) = time(s"D_propagate rep$rep") {
        TextOps.propagateToFixpoint(edges, init)
      }
      println(s"TIMECLUSTER rounds=$rounds edges=${edges.count()} " +
        s"labeled=${labels.count()}")
      time(s"E_rollup rep$rep") { noop(TextOps.clusterRollup(labels)) }
    }
    spark.stop()
  }
}
