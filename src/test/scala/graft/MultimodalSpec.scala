package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpecBase {

  test("extractFeatures (mapPartitions) agrees with the column-expression path") {
    implicit val s = spark
    val media = Multimodal.synthesize(spark, Sf0001)
    val viaMap = Multimodal.extractFeatures(media)
      .select(col("mediaId"), col("nBytes"), col("contentHash"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getString(2)))).toMap
    val viaExpr = media
      .select(col("media_id"), octet_length(col("content")), md5(col("content")))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getString(2)))).toMap
    assert(viaMap.size === viaExpr.size)
    viaExpr.foreach { case (id, (n, h)) =>
      val (nm, hm) = (viaMap(id)._1, viaMap(id)._2)
      assert((nm, hm) === (n, h), s"media $id")
    }
  }

  test("extractFeatures introduces no shuffle (no Exchange in plan)") {
    implicit val s = spark
    val plan = Multimodal.extractFeatures(Multimodal.synthesize(spark, Sf0001))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("frameSample emits ceil(duration/every) frames per media") {
    val media = Multimodal.synthesize(spark, Sf0001)
    val sampled = Multimodal.frameSample(media, everyMs = 1000)
    val perMedia = sampled.groupBy("media_id").count()
      .join(media.select(col("media_id"), col("meta.durationMs").as("d")), "media_id")
      .collect()
    perMedia.foreach { r =>
      val expect = math.max((r.getAs[Int]("d") + 999) / 1000, 1)
      assert(r.getAs[Long]("count") === expect, s"media ${r.get(0)} duration ${r.get(2)}")
    }
  }

  test("decodeStub is deterministic and empty-safe") {
    val (h1, b1) = Multimodal.decodeStub("hello".getBytes)
    val (h2, b2) = Multimodal.decodeStub("hello".getBytes)
    assert(h1 === h2 && b1 === b2)
    val (_, b0) = Multimodal.decodeStub(Array.emptyByteArray)
    assert(b0 === 0.0)
  }
}
