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
