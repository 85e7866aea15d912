package graft

import org.apache.spark.sql.functions._
import graft.sim.Similarity

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("cosine: orthogonal=0, identical=1, opposite=-1 (native and composed)") {
    Similarity.ensureRegistered(spark)
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f), 1.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0)
    ).toDF("a", "b", "expected")
    df.withColumn("sim", Similarity.cosine(col("a"), col("b")))
      .withColumn("simc", Similarity.cosineComposed(col("a"), col("b")))
      .collect().foreach { r =>
        assert(math.abs(r.getAs[Double]("sim") - r.getAs[Double]("expected")) < 1e-9)
        // native kernel and composed tree agree bit-for-bit (same fold order)
        assert(r.getAs[Double]("sim") === r.getAs[Double]("simc"))
      }
  }

  test("lshSignature: deterministic and within [0, 2^planes)") {
    val df = Seq(Tuple1(Array.tabulate(8)(i => (i * 0.1f - 0.3f)))).toDF("e")
    val s1 = df.select(Similarity.lshSignature(col("e"), 6)).head().getLong(0)
    val s2 = df.select(Similarity.lshSignature(col("e"), 6)).head().getLong(0)
    assert(s1 === s2)
    assert(s1 >= 0 && s1 < 64)
  }

  test("q26 brute-force top-k: self excluded, ranks 1..3, sims non-increasing per probe") {
    val rows = Similarity.q26CosineTopK(spark, Sf001).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq === (1 to rs.length))
      assert(!rs.exists(_.getAs[Long]("cid") == qid))
      val sims = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b - 1e-9 })
    }
  }

  test("q43 IVF ANN recall@3 clears the floor with bounded candidate sets") {
    val df = Similarity.q43AnnIvf(spark, Sf001).collect()
    val meanRecall = df.map(_.getAs[Double]("recall3")).sum / df.length
    assert(meanRecall >= 0.3, s"mean recall3 = $meanRecall")
    // nprobe=2 of 16 clusters: candidates must stay well under the corpus
    val nVecs = Tables.embeddings(spark, Sf001).count()
    val maxCand = df.map(_.getAs[Long]("n_candidates")).max
    assert(maxCand < nVecs / 2, s"candidates $maxCand not sub-linear vs $nVecs")
  }

  test("q27 ANN recall@3 clears the floor (multi-table LSH)") {
    val df = Similarity.q27AnnLsh(spark, Sf001).collect()
    val meanRecall = df.map(_.getAs[Double]("recall3")).sum / df.length
    assert(meanRecall >= 0.2, s"mean recall3 = $meanRecall")
  }
}
