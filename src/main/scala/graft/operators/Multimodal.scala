package graft.operators

import graft.sources.{avro, AvroCodec}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, batch-decoded per partition.
  *
  * The payloads are REAL PNG files (rendered deterministically per
  * document — standing in for images ingested from object storage) and
  * the decode/resize/frame stages run a real pure-JVM codec
  * ([[PngCodec]], `javax.imageio`): geometry and luminance come from
  * actual decoded pixels, not container headers. The Spark shape is the
  * production one — schema'd binary columns, one decoder instance per
  * partition via mapPartitions (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage), rows streamed. Heavier codecs (JPEG via
  * TwelveMonkeys, video via javacv) swap into [[PngCodec]] without
  * touching any Spark plumbing.
  */
object Multimodal {

  /** Decoded media record (one per payload); `width`/`height` are the
    * DECODED geometry, `n_bytes` the encoded payload size. */
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

  /** Deterministic synthetic "camera roll": one real PNG per document
    * (gradient+hash pattern seeded by doc_id), wrapped in an Avro
    * container with typed header — the ingest layout of a binary media
    * column. Geometry varies per doc: 64≤w<256, 64≤h<192.
    *
    * Memoized per corpus dir (persisted): the render is test-data
    * SYNTHESIS standing in for bytes already sitting in object
    * storage — re-encoding 5k PNGs per query would bill producer work
    * to every consumer-side operator under test. */
  def fakeMediaTable(spark: SparkSession, sfDir: String): DataFrame =
    mediaCache.getOrElseUpdate(sfDir, {
      import spark.implicits._
      val ids = graft.Tables.load(spark, sfDir, "documents")
        .select(col("doc_id")).as[Long]
      val rendered = ids.mapPartitions { it =>
        it.map { id =>
          val w = 64 + (id % 192).toInt
          val h = 64 + ((id * 7) % 128).toInt
          (id, w, h, "image/png", PngCodec.render(id, w, h))
        }
      }.toDF("doc_id", "width", "height", "fmt", "data")
      rendered.select(col("doc_id"),
        avro.to_avro(struct(col("doc_id"), col("width"), col("height"),
          col("fmt"), col("data")).cast(containerType),
          "MediaContainer").as("media"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  private val mediaCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Partition-batched decode: binary container -> PNG-decoded
    * metadata. One decoder per partition, rows streamed — the exact
    * shape a Pandas-UDF/mapInPandas decode stage has, so batch size
    * and memory behavior are realistic. */
  def decodeMedia(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(avro.from_avro(col("media"), containerSchemaJson).as("c"))
      .select(col("c.doc_id").as("doc_id"), col("c.data").as("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, data) =>
          val img = PngCodec.decode(data)
          MediaMeta(id, img.getWidth, img.getHeight, data.length.toLong,
            PngCodec.meanLuma(img))
        }
      }
  }

  /** Resized media record: decoded + target geometry; `n_bytes` is the
    * re-encoded PNG size of the resized image. */
  case class ResizedMeta(doc_id: Long, width: Int, height: Int,
      out_width: Int, out_height: Int, n_bytes: Long, mean_luma: Double)

  /** Resize stage: same partition-batched shape as [[decodeMedia]] —
    * decode, scale into a `maxSide` bounding box (real bilinear
    * drawImage), re-encode, re-extract features. Chained after decode
    * in a real pipeline; here fused per row so the payload bytes cross
    * the wire once. */
  def resizeMedia(spark: SparkSession, media: DataFrame,
      maxSide: Int = 64): Dataset[ResizedMeta] = {
    import spark.implicits._
    media.select(avro.from_avro(col("media"), containerSchemaJson).as("c"))
      .select(col("c.doc_id").as("doc_id"), col("c.data").as("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, data) =>
          val img = PngCodec.decode(data)
          val (w, h) = (img.getWidth, img.getHeight)
          val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
          val small = PngCodec.resize(img, scale)
          val out = PngCodec.encode(small)
          ResizedMeta(id, w, h, small.getWidth, small.getHeight,
            out.length.toLong, PngCodec.meanLuma(small))
        }
      }
  }

  /** Frame-sampled record: the payload read as a vertical filmstrip of
    * `frameRows`-row frames; `frame_bytes` = decoded RGB bytes per
    * frame. */
  case class FrameMeta(doc_id: Long, n_frames: Int, sampled: Int,
      frame_bytes: Int, mean_luma: Double)

  /** Frame-sampling stage: decode the strip once, keep every
    * `stride`-th frame as a subimage (the video analogue of decode —
    * one decoder per partition, frames streamed), features over the
    * KEPT frames only. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameRows: Int = 16, stride: Int = 4): Dataset[FrameMeta] = {
    import spark.implicits._
    media.select(avro.from_avro(col("media"), containerSchemaJson).as("c"))
      .select(col("c.doc_id").as("doc_id"), col("c.data").as("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, data) =>
          val img = PngCodec.decode(data)
          val nFrames = math.max(1, img.getHeight / frameRows)
          val kept = (0 until nFrames by stride).toArray
          var sum = 0.0
          kept.foreach { f =>
            val rows = math.min(frameRows, img.getHeight - f * frameRows)
            sum += PngCodec.meanLuma(img.getSubimage(0, f * frameRows,
              img.getWidth, rows))
          }
          FrameMeta(id, nFrames, kept.length, img.getWidth * frameRows * 3,
            math.rint(sum / kept.length * 100) / 100)
        }
      }
  }
}

/** Pure-JVM PNG codec on `javax.imageio` — real encode/decode/resize,
  * no native or third-party libraries. */
object PngCodec {
  import java.awt.image.BufferedImage
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.imageio.ImageIO

  // no temp-file cache: executor threads encode/decode concurrently
  ImageIO.setUseCache(false)

  /** Deterministic gray test pattern for `id` at w x h, as PNG bytes. */
  def render(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h) // bulk raster write, not per-pixel setRGB
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((id * 31 + x * 7 + y * 13) % 256).toInt
        px(y * w + x) = (g << 16) | (g << 8) | g
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    encode(img)
  }

  def encode(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream(1024)
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  def decode(data: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(data))
    require(img != null, s"graft media: undecodable payload (${data.length} bytes)")
    img
  }

  /** Rec.601 mean luminance over the decoded pixels, 2dp. */
  def meanLuma(img: BufferedImage): Double = {
    val (w, h) = (img.getWidth, img.getHeight)
    val px = img.getRGB(0, 0, w, h, null, 0, w) // bulk raster read
    var sum = 0.0
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
      i += 1
    }
    math.rint(sum / px.length * 100) / 100
  }

  /** Bilinear scale by `scale` (≤1), min 1px per side. */
  def resize(img: BufferedImage, scale: Double): BufferedImage = {
    if (scale >= 1.0) return img
    val ow = math.max(1, (img.getWidth * scale).toInt)
    val oh = math.max(1, (img.getHeight * scale).toInt)
    val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, ow, oh, null)
    } finally g.dispose()
    out
  }
}
