package graft

import org.apache.spark.sql.functions._

import graft.sim.{IndexParams, Similarity}

/** q147's invariants — the rows-only driver gate can't check contents
  * (signatures are engine-seeded, centroids accumulation-noisy), so the
  * conservation laws live here. */
class IndexStatsSpec extends SparkSpecBase {

  private lazy val rows = Similarity.q147IndexStats(spark, Sf001).collect()
  private lazy val n = Tables.embeddings(spark, Sf001).count()
  private lazy val nDocs = Tables.documents(spark, Sf001).count()

  test("shape: one row per LSH table, one IVF row, one row per band position") {
    val bands = 64 / IndexParams.simhashBandBits(nDocs)
    assert(rows.length === 4 + 1 + bands, rows.map(_.getString(1)).mkString(","))
    assert(rows.count(_.getString(0) == "lsh") === 4)
    assert(rows.count(_.getString(0) == "ivf") === 1)
    assert(rows.count(_.getString(0) == "simhash") === bands)
  }

  test("conservation: every unit's occupancies sum to its corpus count") {
    rows.foreach { r =>
      val expected = if (r.getString(0) == "simhash") nDocs else n
      assert(r.getAs[Long]("n_entries") === expected, r.toString)
    }
  }

  test("ordering invariants: min <= mean <= max, keys bounded by entries") {
    rows.foreach { r =>
      val (mn, mx, avg100) = (r.getAs[Long]("occ_min"),
        r.getAs[Long]("occ_max"), r.getAs[Long]("occ_avg_x100"))
      assert(mn * 100 <= avg100 && avg100 <= mx * 100, r.toString)
      assert(r.getAs[Long]("n_keys") <= r.getAs[Long]("n_entries"), r.toString)
      assert(r.getAs[Long]("n_hot") <= r.getAs[Long]("n_keys"), r.toString)
    }
    // the IVF row's key count is bounded by k
    val ivf = rows.find(_.getString(0) == "ivf").get
    assert(ivf.getAs[Long]("n_keys") <= IndexParams.ivfK(n))
  }

  test("LSH and SimHash rows are bit-deterministic across invocations " +
      "(pure functions of content; the IVF row legitimately is not)") {
    val again = Similarity.q147IndexStats(spark, Sf001).collect()
    def stable(rs: Array[org.apache.spark.sql.Row]) =
      rs.filter(_.getString(0) != "ivf").map(_.toSeq).toSeq
    assert(stable(again) === stable(rows))
  }

  test("ivfLayoutOccupancies reads the persisted layout's actual partition " +
      "counts, spanning appended generations") {
    import spark.implicits._
    val idxDir = java.nio.file.Files.createTempDirectory("g_ivf_stats")
      .toString + "/layout"
    Seq((0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f))).toDF("cid", "ce")
      .write.parquet(s"$idxDir/centroids")
    Seq.tabulate(10)(i => (i.toLong, Array(1.0f, 0.0f), i % 2))
      .toDF("vec_id", "embedding", "cid")
      .write.partitionBy("cid").parquet(s"$idxDir/assigned")
    // a q146-style appended generation lands only in cid=1
    Seq((100L, Array(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "cid")
      .write.mode("append").partitionBy("cid").parquet(s"$idxDir/assigned")
    assert(Similarity.ivfLayoutBuilt(spark, idxDir))
    val occ = Similarity.ivfLayoutOccupancies(spark, idxDir).collect()
      .map(r => r.getAs[Number]("cid").intValue -> r.getAs[Long]("occ")).toMap
    assert(occ === Map(0 -> 5L, 1 -> 6L))
  }

  test("q147's IVF row audits the layout ACTUALLY SERVING when the q143 " +
      "build exists — equal to its partition row counts, not a recompute") {
    // ensure the serving layout exists (idempotent build-or-reuse)
    Similarity.q143IvfPartitionedProbe(spark, Sf001).collect()
    val servingDir = Similarity.ivfBaseLayoutDir(Sf001, IndexParams.ivfK(n))
    assert(Similarity.ivfLayoutBuilt(spark, servingDir))
    val lay = Similarity.ivfLayoutOccupancies(spark, servingDir)
      .agg(count(lit(1)), sum(col("occ")), min(col("occ")), max(col("occ")))
      .head()
    val ivf = Similarity.q147IndexStats(spark, Sf001).collect()
      .find(_.getString(0) == "ivf").get
    assert(ivf.getAs[Long]("n_keys") === lay.getLong(0))
    assert(ivf.getAs[Long]("n_entries") === lay.getLong(1))
    assert(ivf.getAs[Long]("occ_min") === lay.getLong(2))
    assert(ivf.getAs[Long]("occ_max") === lay.getLong(3))
  }
}
