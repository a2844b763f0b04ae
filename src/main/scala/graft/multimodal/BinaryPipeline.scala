package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batched decode/feature-extract over partitions.
  *
  * The Spark-side contract is real and tested — schema, partition-batched
  * execution, deterministic output — while the actual media decode is a
  * STUB (`fakeDecode`): the container has no image/audio codecs, so the
  * decode produces a deterministic synthetic "pixel summary" from the bytes.
  * Swapping `fakeDecode` for a real codec (e.g. javacpp-ffmpeg) changes no
  * plumbing.
  *
  * Scale notes: decode runs via `mapPartitions` (the Scala analogue of
  * `mapInPandas` batch UDFs) so per-partition setup (codec init) amortizes;
  * binary payloads never pass through a shuffle — only extracted features
  * do. Partitioning by (modality) up front keeps homogeneous batches so a
  * codec pool per executor stays warm.
  */
object BinaryPipeline {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("payload", BinaryType, nullable = false)
  ))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)
  ))

  /** Deterministic stand-in for a media decoder: 8 pseudo-"channel means"
    * derived from payload bytes. Replace with a real codec in production.
    */
  def fakeDecode(payload: Array[Byte], dims: Int = 8): Array[Double] = {
    val acc = new Array[Long](dims)
    var i = 0
    while (i < payload.length) {
      acc(i % dims) += (payload(i) & 0xff)
      i += 1
    }
    acc.map(a => if (payload.isEmpty) 0.0 else a.toDouble / payload.length)
  }

  private def checksum(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    h
  }

  /** Batched decode+feature-extract: binary in, features out, one codec
    * "session" per partition.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media
      .repartition(col("modality")) // homogeneous batches per codec
      .mapPartitions { rows =>
        // per-partition codec init would live here
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(
            r.getAs[Long]("media_id"),
            r.getAs[String]("modality"),
            payload.length,
            checksum(payload),
            fakeDecode(payload)
          )
        }
      }(enc)
  }

  /** Image resize stage (STUB decode): maps payload → fixed-size "pixel"
    * grid deterministically. The real implementation swaps the per-element
    * kernel; the contract (binary in, w×h float grid out, map-only,
    * codec-per-partition) is what the pipeline depends on.
    */
  def resizeImages(media: DataFrame, outW: Int = 4, outH: Int = 4): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("pixels", ArrayType(DoubleType, containsNull = false), nullable = false))))
    media.where(col("modality") === "image").mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        val px = Array.tabulate(outW * outH) { i =>
          if (p.isEmpty) 0.0 else (p(i % p.length) & 0xff) / 255.0
        }
        Row(r.getAs[Long]("media_id"), px)
      }
    }(enc)
  }

  /** Video frame-sampling stage (STUB decode): emits every `stride`-th
    * fixed-size chunk of the payload as a "frame" (1→N explode shape — the
    * real sampler yields decoded frames at the same cardinality).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 16, stride: Int = 2): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false))))
    media.where(col("modality") === "video").flatMap { r =>
      val p = r.getAs[Array[Byte]]("payload")
      val nFrames = p.length / frameBytes
      (0 until nFrames by stride).map { i =>
        Row(r.getAs[Long]("media_id"), i, p.slice(i * frameBytes, (i + 1) * frameBytes))
      }
    }(enc)
  }

  /** Synthetic media table for tests/demos: payload bytes derived
    * deterministically from the id.
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val modality = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val payload = Array.tabulate[Byte](64 + (id % 32).toInt)(i => ((id * 131 + i * 7) % 251).toByte)
      Row(id, modality,
        if (modality == "image") Integer.valueOf(64) else null,
        if (modality == "image") Integer.valueOf(48) else null,
        if (modality == "audio") Integer.valueOf(16000) else null,
        payload)
    }(enc)
  }
}
