package graft

import org.apache.spark.sql.functions._
import graft.prep.DataPrep

class DataPrepSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsDir(rows: (Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("prep").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source",
        concat(lit("s"), col("doc_id") % 2))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("chunking covers every token, overlaps by width-stride, drops suffix-only tails") {
    // 8 tokens, width 4, stride 3 → starts 0,3; start 6 is a pure suffix
    // of the start-3 chunk (6 >= 8-4+3 = 7? no: 6 < 7 → kept, adds tok 8)
    val dir = docsDir((1L, "t1 t2 t3 t4 t5 t6 t7 t8"), (2L, "a b c"), (3L, ""))
    val out = DataPrep.q82ChunkOverlap(spark, dir, width = 4, stride = 3)
      .select("doc_id", "chunk_id", "n_toks", "chunk_text")
      .as[(Long, Long, Int, String)].collect()
    assert(out.toSeq === Seq(
      (1L, 0L, 4, "t1 t2 t3 t4"),
      (1L, 1L, 4, "t4 t5 t6 t7"),
      (1L, 2L, 2, "t7 t8"),      // adds t8 → kept despite being short
      (2L, 0L, 3, "a b c")))     // short doc → one chunk; empty doc → none
  }

  test("chunking drops a trailing window that adds no new tokens") {
    // 6 tokens, width 4, stride 3: start 3 covers 4..6; its end (6) equals
    // the doc end AND 3 >= 6-4+3=5 is false → kept. With 5 tokens:
    // start 3 end 5; 3 >= 5-4+3=4 false → kept (adds tok 5). With 4 tokens:
    // start 3 >= 4-4+3=3 → dropped (tokens 4.. already inside chunk 0).
    val dir = docsDir((1L, "x1 x2 x3 x4"))
    val out = DataPrep.q82ChunkOverlap(spark, dir, width = 4, stride = 3)
      .select("chunk_id").as[Long].collect()
    assert(out.toSeq === Seq(0L), "suffix-only window must be dropped")
  }

  test("source quota keeps exactly quota docs per source, deterministically") {
    val out = DataPrep.q83SourceQuota(spark, Sf001, quota = 15)
    val rows = out.select("source", "n_docs", "n_kept", "n_dropped")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length === 20)
    rows.foreach { case (s, n, k, drop) =>
      assert(k === math.min(15L, n), s); assert(k + drop === n, s)
    }
    // determinism under a different physical layout: rewrite the corpus
    // shuffled into 7 partitions — the kept SET (witnessed by kept_id_sum)
    // must not change, because priority is a pure function of doc_id
    val dir = java.nio.file.Files.createTempDirectory("quota").toString
    Tables.documents(spark, Sf001)
      .repartition(7, col("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val again = DataPrep.q83SourceQuota(spark, dir, quota = 15)
      .select("source", "kept_id_sum").as[(String, Long)].collect().toMap
    val base = out.select("source", "kept_id_sum").as[(String, Long)].collect().toMap
    assert(again === base)
  }
  test("q90: tempered mixture shares sum to 100 and flatten the raw mix") {
    val rows = DataPrep.q90MixtureWeights(spark, Sf001).collect()
    assert(rows.length > 1)
    def tot(c: String) = rows.map(_.getAs[Double](c)).sum
    assert(math.abs(tot("raw_share") - 100.0) < 0.05)
    assert(math.abs(tot("mix_share") - 100.0) < 0.05)
    // sqrt temperature moves every share toward the mean: the largest
    // source shrinks, the smallest grows
    val byRaw = rows.sortBy(_.getAs[Double]("raw_share"))
    assert(byRaw.last.getAs[Double]("mix_share") <=
      byRaw.last.getAs[Double]("raw_share") + 1e-9)
    assert(byRaw.head.getAs[Double]("mix_share") >=
      byRaw.head.getAs[Double]("raw_share") - 1e-9)
    rows.foreach(r => assert(r.getAs[Double]("epochs") > 0.0))
  }

  test("q95: decile occupancies tile the corpus; chi2 matches its bins") {
    val rows = DataPrep.q95DecileCalibration(spark, Sf001).collect()
    assert(rows.nonEmpty)
    val grand = rows.map(_.getAs[Long]("n_docs")).sum
    // global deciles of a 10-bin split cover every doc exactly once
    val cells = rows.flatMap(r => (0 until 10).map(i => r.getAs[Long](s"d$i")))
    assert(cells.sum === grand)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val snd2 = (0 until 10).map(i => r.getAs[Long](s"d$i")).map(x => x * x).sum
      val expect = (10.0 * snd2 - n.toDouble * n) / n
      assert(math.abs(r.getAs[Double]("chi2") - expect) < 1e-3)
      assert(r.getAs[Boolean]("len_skew_flag") === ((10 * snd2 - n * n) * 4 > 87 * n))
    }
  }

  test("q60: two-phase top-K path is bitwise-equal to the window form " +
      "(sf0.001 and sf0.01, plus a k larger than some class)") {
    def bits(r: org.apache.spark.sql.Row): Seq[Any] = r.toSeq.map {
      case d: Double => java.lang.Double.doubleToLongBits(d)
      case x => x
    }
    for (dir <- Seq(Sf0001, Sf001); k <- Seq(3, 100, 1000000)) {
      val win = DataPrep.q60StratifiedSample(spark, dir, k).collect().map(bits)
      val two = DataPrep.q60StratifiedSampleScaled(spark, dir, k).collect().map(bits)
      assert(two.toSeq === win.toSeq, s"dir=$dir k=$k")
    }
  }

  test("q144: weighted sampling up-weights heavy docs (sample mean weight " +
      "> population mean weight per source) and k bounds the sample") {
    val rows = DataPrep.q144WeightedSample(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_total")
      val s = r.getAs[Long]("n_sampled")
      assert(s === math.min(25L, n), r.toString)
      // the point of the weighting: priority = u div w makes heavier docs
      // likelier, so the sample's mean weight must exceed the population's
      // wherever the sample is a strict subset
      if (s < n)
        assert(r.getAs[Long]("samp_w_avg_x10k") > r.getAs[Long]("pop_w_avg_x10k"),
          r.toString)
    }
  }

  test("q152: rebalance plan is conserving and deterministic — full-keep " +
      "sources keep everything, capped sources land near their rate, and " +
      "two runs are bit-identical") {
    val rows = DataPrep.q152MixtureRebalance(spark, Sf001).collect()
    assert(rows.nonEmpty)
    val totalChars = rows.map(_.getAs[Long]("chars")).sum
    rows.foreach { r =>
      val (chars, kept) = (r.getAs[Long]("chars"), r.getAs[Long]("kept_chars"))
      val rate = r.getAs[Long]("rate_bp")
      assert(r.getAs[Long]("target_chars") === totalChars / 2 / rows.length, r)
      assert(kept <= chars && r.getAs[Long]("kept_docs") <= r.getAs[Long]("n_docs"))
      if (rate === 10000L) {
        assert(r.getAs[Long]("kept_docs") === r.getAs[Long]("n_docs"), r)
        assert(kept === chars, r)
      } else {
        // hash-uniform draw: achieved share tracks the planned rate; the
        // bound is loose (per-source doc counts are small at sf0.001)
        assert(math.abs(r.getAs[Long]("achieved_bp") - rate) < 3000, r)
      }
    }
    // the whole point: re-running reproduces the identical plan + sample
    val again = DataPrep.q152MixtureRebalance(spark, Sf001).collect()
    assert(rows.toSeq === again.toSeq)
  }

}
