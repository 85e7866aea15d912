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

  test("frameSample emits ceil(duration/every) frames; zero-duration yields none") {
    import spark.implicits._
    val media = Multimodal.synthesize(spark, Sf0001)
    val sampled = Multimodal.frameSample(media, everyMs = 1000)
    val perMedia = media.select(col("media_id"), col("meta.durationMs").as("d"))
      .join(sampled.groupBy("media_id").count(), Seq("media_id"), "left")
      .collect()
    perMedia.foreach { r =>
      val d = r.getAs[Int]("d")
      val got = if (r.isNullAt(2)) 0L else r.getLong(2)
      val expect = if (d <= 0) 0L else (d + 999) / 1000
      assert(got === expect, s"media ${r.get(0)} duration $d")
    }
    // crafted zero-duration media row produces no frames
    val zero = Seq((99L, "image", Array[Byte](), (0, 0, 0, "stub")))
      .toDF("media_id", "kind", "content", "meta")
      .withColumn("meta", col("meta").cast("struct<width:int,height:int,durationMs:int,codec:string>"))
    assert(Multimodal.frameSample(zero, 1000).count() === 0)
  }

  test("frameSample budget caps per-item fan-out from the schedule start") {
    val media = Multimodal.synthesize(spark, Sf0001)
    val budget = 4
    val perMedia = media.select(col("media_id"), col("meta.durationMs").as("d"))
      .join(Multimodal.frameSample(media, everyMs = 1000, maxFrames = budget)
        .groupBy("media_id").agg(count(lit(1)).as("n"), max("frame_ms").as("mx")),
        Seq("media_id"), "left")
      .collect()
    perMedia.foreach { r =>
      val d = r.getAs[Int]("d")
      val expect = if (d <= 0) 0L else math.min((d + 999) / 1000, budget.toLong)
      val got = if (r.isNullAt(r.fieldIndex("n"))) 0L else r.getAs[Long]("n")
      assert(got === expect, s"media ${r.get(0)} duration $d")
      // capped items sample the FIRST frames (budget from the start, not a stride)
      if (got == budget.toLong)
        assert(r.getAs[Int]("mx") === (budget - 1) * 1000, s"media ${r.get(0)}")
    }
  }

  test("frameSample budget bounds the schedule at extreme durations") {
    import spark.implicits._
    // Int.MaxValue ms ≈ 24 days of media: the budget must bound the
    // generated sequence itself (O(maxFrames)), not slice a multi-million-
    // element intermediate array
    val long = Seq((7L, "video", Array[Byte](1), (1, 1, Int.MaxValue, "stub")))
      .toDF("media_id", "kind", "content", "meta")
      .withColumn("meta", col("meta").cast("struct<width:int,height:int,durationMs:int,codec:string>"))
    val frames = Multimodal.frameSample(long, everyMs = 500, maxFrames = 4)
      .select("frame_ms").as[Int].collect().sorted
    assert(frames === Array(0, 500, 1000, 1500))
  }

  test("resizeStub fits within the target box preserving aspect ratio") {
    val media = Multimodal.synthesize(spark, Sf0001)
    val resized = Multimodal.resizeStub(media, 640, 480).collect()
    resized.foreach { r =>
      val m = r.getStruct(r.fieldIndex("meta"))
      assert(m.getInt(0) <= 640 && m.getInt(1) <= 480,
        s"media ${r.get(0)}: ${m.getInt(0)}x${m.getInt(1)}")
      assert(m.getString(3).endsWith("-resized"))
      assert(r.getString(r.fieldIndex("resize_tag")).length === 32)
    }
  }

  test("decodeStub is deterministic and empty-safe") {
    val (h1, b1) = Multimodal.decodeStub("hello".getBytes)
    val (h2, b2) = Multimodal.decodeStub("hello".getBytes)
    assert(h1 === h2 && b1 === b2)
    val (_, b0) = Multimodal.decodeStub(Array.emptyByteArray)
    assert(b0 === 0.0)
  }

  test("decodeImage recovers exact dims and brightness from a real PNG " +
      "and falls back to byte stats on garbage") {
    val img = new java.awt.image.BufferedImage(
      12, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = 137
    val rgb = (g << 16) | (g << 8) | g
    for (y <- 0 until 9; x <- 0 until 12) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (ok, w, h, b) = Multimodal.decodeImage(bos.toByteArray)
    assert(ok && w === 12 && h === 9 && b === g.toDouble)
    val (ok2, w2, h2, b2) = Multimodal.decodeImage(Array[Byte](0, 1, 2, 3))
    assert(!ok2 && w2 === 0 && h2 === 0 && b2 === 1.5)
  }

  test("q119: planted brightness-shifted copies differ in bytes (exact " +
      "dedup misses) but share the decoded-pixel dhash (perceptual catches)") {
    import spark.implicits._
    val imgs = Multimodal.synthesizePatternImages(spark, Sf0001)
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .collect().toMap
    val planted = imgs.keys.filter(_ >= 5000000L).toSeq.sorted
    assert(planted.nonEmpty)
    def dhash(bytes: Array[Byte]): Long = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      var dh = 0L
      for (y <- 0 until 8; x <- 0 until 8; if y * 8 + x < 63)
        if ((img.getRGB(x + 1, y) & 0xff) > (img.getRGB(x, y) & 0xff))
          dh |= 1L << (y * 8 + x)
      dh
    }
    planted.foreach { pid =>
      val base = pid - 5000000L
      assert(!java.util.Arrays.equals(imgs(pid), imgs(base)),
        s"planted $pid must differ in bytes from $base")
      assert(dhash(imgs(pid)) === dhash(imgs(base)),
        s"planted $pid must share $base's dhash")
    }
    // and the rollup reflects it: at least one dup per planted copy
    val out = Multimodal.q119ImageNearDup(spark, Sf0001).collect()
    assert(out.map(_.getAs[Long]("n_dup_images")).sum >=
      out.map(_.getAs[Long]("n_planted")).sum)
  }

  test("q120: WAV round-trip recovers the exact sample ramp per row; " +
      "garbage falls back") {
    import spark.implicits._
    val rows = Multimodal.synthesizeAudio(spark, Sf0001)
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, bytes) =>
      val (ok, n, sumAbs, maxAmp) = Multimodal.decodeAudio(bytes)
      if (id % 50 == 0) assert(!ok && n === 0L)
      else {
        val exp = (0 until (800 + id % 50).toInt)
          .map(i => ((i * (3 + id % 7) + id) % 2001L) - 1000L)
        assert(ok, s"doc $id must decode")
        assert(n === exp.length.toLong, s"doc $id sample count")
        assert(sumAbs === exp.map(math.abs).sum, s"doc $id sum|s|")
        assert(maxAmp === exp.max, s"doc $id max")
      }
    }
  }

  test("q128: frame features match a direct recompute from the generator " +
      "ramp; every decoded clip yields exactly its full frames") {
    import spark.implicits._
    val FrameLen = 160
    val rows = Multimodal.q128AudioFrameFeatures(spark, Sf0001).collect()
    assert(rows.length === 4) // one row per media bucket
    // brute-force reference over the generator formula, framed identically
    val docs = graft.Tables.documents(spark, Sf0001)
      .select(col("doc_id")).as[Long].collect()
    case class B(var nDec: Long = 0, var frames: Long = 0, var energy: Long = 0,
                 var maxE: Long = 0, var zc: Long = 0)
    val ref = Array.fill(4)(B())
    docs.filter(_ % 50 != 0).foreach { id =>
      val n = (800 + id % 50).toInt
      val s = (0 until n).map(i => (((i * (3 + id % 7) + id) % 2001L) - 1000L).toInt)
      val b = ref((id % 4).toInt)
      b.nDec += 1
      (0 until n / FrameLen).foreach { f =>
        val fr = s.slice(f * FrameLen, (f + 1) * FrameLen)
        val e = fr.map(v => v.toLong * v).sum
        b.frames += 1; b.energy += e; b.maxE = math.max(b.maxE, e)
        b.zc += fr.sliding(2).count(p => p.head * p(1) < 0)
      }
    }
    rows.foreach { r =>
      val b = ref(r.getLong(0).toInt)
      assert(r.getAs[Long]("n_decoded") === b.nDec)
      assert(r.getAs[Long]("total_frames") === b.frames)
      // n in [800, 849] → exactly 5 full frames per decoded clip
      assert(r.getAs[Long]("total_frames") === 5 * b.nDec)
      assert(r.getAs[Long]("total_energy") === b.energy)
      assert(r.getAs[Long]("max_frame_energy") === b.maxE)
      assert(r.getAs[Long]("total_zero_cross") === b.zc)
    }
  }

  test("q121: the GIF container round-trip recovers frame count and exact " +
      "frame grays per row; garbage falls back") {
    import spark.implicits._
    val rows = Multimodal.synthesizeAnimations(spark, Sf0001)
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, bytes) =>
      val (ok, n, redSum) = Multimodal.decodeAnimation(bytes)
      if (id % 50 == 0) assert(!ok && n === 0)
      else {
        val expN = (2 + id % 5).toInt
        val expRed = (0 until expN).map(k => 64L * ((7 * id + 13 * k) % 256)).sum
        assert(ok, s"doc $id must decode")
        assert(n === expN, s"doc $id frame count")
        assert(redSum === expRed, s"doc $id red sum")
      }
    }
  }

  test("q102 per-row decode agrees with the generator's parameters for " +
      "every row (not just in aggregate)") {
    import spark.implicits._
    val feats = Multimodal.synthesizeImages(spark, Sf0001)
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .collect()
      .map { case (id, bytes) => id -> Multimodal.decodeImage(bytes) }
    assert(feats.nonEmpty)
    feats.foreach { case (id, (ok, w, h, b)) =>
      if (id % 50 == 0) assert(!ok && b === 1.5)
      else {
        assert(ok, s"doc $id must decode")
        assert(w === 8 + (id % 16).toInt && h === 8 + (id % 8).toInt)
        assert(b === (id % 256).toDouble, s"doc $id brightness")
      }
    }
  }
}
