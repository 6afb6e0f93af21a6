package graft.operators

import graft.sources.{avro, AvroCodec}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, batch-decoded per partition.
  *
  * The Spark-side mechanics are real and tested — schema, partitioned
  * batch decode via mapPartitions (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage), deterministic output. The actual media codec
  * is a STUB (no image/audio libraries in this container): payloads
  * are self-describing fake containers and `decodeStub` parses them.
  * Swapping in a real codec changes only [[MultimodalStub.decodeStub]].
  */
object Multimodal {

  /** Decoded media record (one per payload). */
  case class MediaMeta(doc_id: Long, width: Int, height: Int,
      n_bytes: Long, mean_luma: Double)

  private val containerType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("fmt", StringType),
    StructField("data", BinaryType)))

  val containerSchemaJson: String =
    AvroCodec.avroSchemaFor(containerType, "MediaContainer").toString

  /** Fabricate a deterministic fake "image file" per document: an Avro
    * container with typed header + payload bytes (stands in for
    * JPEG/PNG bytes ingested from object storage). */
  def fakeMediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.select(col("doc_id"),
      avro.to_avro(struct(
        col("doc_id"),
        (lit(64) + pmod(col("doc_id"), lit(192))).cast("int").as("width"),
        (lit(64) + pmod(col("doc_id") * 7, lit(128))).cast("int").as("height"),
        lit("fake/raw").as("fmt"),
        col("text").cast("binary").as("data")).cast(containerType),
        "MediaContainer").as("media"))
  }

  /** Partition-batched decode: binary container -> typed metadata +
    * stub feature extraction. One decoder instance per partition,
    * rows streamed — the exact shape a Pandas-UDF/mapInPandas decode
    * stage has, so batch size and memory behavior are realistic. */
  def decodeMedia(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(avro.from_avro(col("media"), containerSchemaJson).as("c"))
      .select(col("c.doc_id").as("doc_id"), col("c.width").as("width"),
        col("c.height").as("height"), col("c.data").as("data"))
      .as[(Long, Int, Int, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder (real codecs hold native state here)
        rows.map { case (id, w, h, data) =>
          MediaMeta(id, w, h, data.length.toLong,
            MultimodalStub.decodeStub(w, h, data))
        }
      }
  }

  /** Resized media record: original + target geometry, payload
    * proportionally subsampled. */
  case class ResizedMeta(doc_id: Long, width: Int, height: Int,
      out_width: Int, out_height: Int, n_bytes: Long, mean_luma: Double)

  /** Resize stage: same partition-batched shape as [[decodeMedia]] —
    * decode, "resize" to a bounding box (stub: geometry scaled,
    * payload subsampled by the same ratio), re-extract features.
    * Chained after decode in a real pipeline; here fused per row so
    * the payload bytes cross the wire once. */
  def resizeMedia(spark: SparkSession, media: DataFrame,
      maxSide: Int = 64): Dataset[ResizedMeta] = {
    import spark.implicits._
    media.select(avro.from_avro(col("media"), containerSchemaJson).as("c"))
      .select(col("c.doc_id").as("doc_id"), col("c.width").as("width"),
        col("c.height").as("height"), col("c.data").as("data"))
      .as[(Long, Int, Int, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, w, h, data) =>
          val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
          val (ow, oh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          val out = MultimodalStub.resizeStub(data, scale)
          ResizedMeta(id, w, h, ow, oh, out.length.toLong,
            MultimodalStub.decodeStub(ow, oh, out))
        }
      }
  }

  /** Frame-sampled record from a fake "video" payload. */
  case class FrameMeta(doc_id: Long, n_frames: Int, sampled: Int,
      frame_bytes: Int, mean_luma: Double)

  /** Frame-sampling stage: treat the payload as fixed-size frames and
    * keep every `stride`-th (the video analogue of decode — one
    * decoder per partition, frames streamed). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 32, stride: Int = 4): Dataset[FrameMeta] = {
    import spark.implicits._
    media.select(avro.from_avro(col("media"), containerSchemaJson).as("c"))
      .select(col("c.doc_id").as("doc_id"), col("c.data").as("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, data) =>
          val nFrames = math.max(1, data.length / frameBytes)
          val kept = (0 until nFrames by stride).toArray
          val sampledBytes = kept.flatMap { f =>
            data.slice(f * frameBytes, math.min((f + 1) * frameBytes, data.length))
          }
          FrameMeta(id, nFrames, kept.length, frameBytes,
            MultimodalStub.decodeStub(1, 1, sampledBytes))
        }
      }
  }
}

/** STUB — media decoding is faked deterministically (container has no
  * real image libs). Replace with a real codec (e.g. TwelveMonkeys /
  * javacv) without touching any Spark plumbing. */
object MultimodalStub {
  /** "Mean luminance" of the fake payload: byte mean scaled by the
    * fake geometry. Deterministic, cheap, obviously not real. */
  /** "Resize" the fake payload: keep every floor(1/scale)-th byte —
    * deterministic, length roughly scales with the area ratio's side. */
  def resizeStub(data: Array[Byte], scale: Double): Array[Byte] = {
    if (scale >= 1.0 || data.isEmpty) return data
    val step = math.max(1, math.round(1.0 / scale).toInt)
    val out = new Array[Byte]((data.length + step - 1) / step)
    var i = 0; var j = 0
    while (i < data.length) { out(j) = data(i); i += step; j += 1 }
    out
  }

  def decodeStub(width: Int, height: Int, data: Array[Byte]): Double = {
    var s = 0L
    var i = 0
    while (i < data.length) { s += (data(i) & 0xff); i += 1 }
    val mean = if (data.length == 0) 0.0 else s.toDouble / data.length
    math.rint(mean * 100) / 100
  }
}
