package graft

import graft.multimodal.BinaryPipeline

class BinaryPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("binary media pipeline: schema, determinism, batch shape") {
    val media = BinaryPipeline.syntheticMedia(spark, 30)
    val feats = BinaryPipeline.extractFeatures(media)

    assert(feats.schema == BinaryPipeline.featureSchema)
    val rows = feats.collect()
    assert(rows.length == 30)
    // deterministic: re-running produces identical checksums
    val again = BinaryPipeline.extractFeatures(media)
      .select("media_id", "checksum").as[(Long, Long)].collect().toMap
    rows.foreach { r =>
      assert(again(r.getAs[Long]("media_id")) == r.getAs[Long]("checksum"))
    }
    // feature vector has fixed dims and is payload-derived (non-constant)
    val f = rows.map(_.getAs[scala.collection.Seq[Double]]("feature"))
    assert(f.forall(_.length == 8))
    assert(f.distinct.length > 1)
  }

  test("fakeDecode stub: empty payload yields zero vector") {
    assert(BinaryPipeline.fakeDecode(Array.emptyByteArray).forall(_ == 0.0))
  }

  test("resize stage: images only, fixed grid, values normalized") {
    val media = BinaryPipeline.syntheticMedia(spark, 30)
    val resized = BinaryPipeline.resizeImages(media, outW = 4, outH = 4).collect()
    assert(resized.length == 10) // ids ≡ 0 mod 3
    resized.foreach { r =>
      val px = r.getAs[scala.collection.Seq[Double]]("pixels")
      assert(px.length == 16 && px.forall(p => p >= 0.0 && p <= 1.0))
    }
  }

  test("ppm decode: exact channel means, comment headers, truncation → quarantine") {
    // 2×2 image with known pixels: red, green, blue, white
    val rgb = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val ppm = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ rgb
    val Some((w, h, px)) = BinaryPipeline.decodePpm(ppm)
    assert(w == 2 && h == 2 && px.length == 12)
    val media = Seq((1L, ppm), (2L, ppm.dropRight(3)), (3L, "nonsense".getBytes))
      .toDF("media_id", "payload").withColumn("modality", org.apache.spark.sql.functions.lit("image"))
    val d = BinaryPipeline.decodeImages(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    // mean of each channel over {red, green, blue, white}: (255+255)/4 = 127.5
    val means = d(1L).getAs[scala.collection.Seq[Double]]("channel_means")
    assert(d(1L).getAs[Boolean]("real_decode"))
    assert(means == Seq(127.5, 127.5, 127.5))
    assert(d(1L).getAs[Int]("width") == 2 && d(1L).getAs[Int]("height") == 2)
    // truncated and garbage payloads are quarantined, never thrown
    assert(!d(2L).getAs[Boolean]("real_decode") && !d(3L).getAs[Boolean]("real_decode"))
  }

  test("ppm resize: nearest-neighbor samples the true pixel grid") {
    // 2×2: black, white / white, black — downscale 2×2 → identity luma
    val rgb = Array[Int](0, 0, 0, 255, 255, 255, 255, 255, 255, 0, 0, 0).map(_.toByte)
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ rgb
    val media = Seq((1L, ppm)).toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("image"))
    val px = BinaryPipeline.resizeImages(media, outW = 2, outH = 2).collect()
      .head.getAs[scala.collection.Seq[Double]]("pixels")
    assert(px == Seq(0.0, 1.0, 1.0, 0.0))
    // synthetic image rows are REAL PPMs: every one decodes
    val synth = BinaryPipeline.decodeImages(BinaryPipeline.syntheticMedia(spark, 30)).collect()
    assert(synth.length == 10 && synth.forall(_.getAs[Boolean]("real_decode")))
  }

  test("frame sampling: 1→N explode with stride") {
    val media = BinaryPipeline.syntheticMedia(spark, 30)
    val frames = BinaryPipeline.sampleFrames(media, frameBytes = 16, stride = 2)
    val byId = frames.collect().groupBy(_.getAs[Long]("media_id"))
    assert(byId.nonEmpty)
    byId.foreach { case (_, fs) =>
      val idxs = fs.map(_.getAs[Int]("frame_idx")).sorted.toSeq
      assert(idxs == idxs.distinct && idxs.forall(_ % 2 == 0)) // stride respected
      assert(fs.forall(_.getAs[Array[Byte]]("frame").length == 16))
    }
  }
}
