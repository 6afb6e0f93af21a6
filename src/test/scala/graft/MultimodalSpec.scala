package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("binary containers decode to typed metadata, batch per partition") {
    val media = Multimodal.fakeMediaTable(spark, sf)
    assert(media.schema("media").dataType.typeName === "binary")
    val decoded = Multimodal.decodeMedia(spark, media)
    val rows = decoded.collect()
    assert(rows.length === 500)
    // payload bytes = document text bytes (ascii) => n_bytes == n_chars
    val chars = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { m =>
      assert(m.n_bytes === chars(m.doc_id))
      assert(m.width >= 64 && m.width < 256)
      assert(m.height >= 64 && m.height < 192)
      assert(m.mean_luma > 0)
    }
  }

  test("resize stage bounds geometry and subsamples the payload") {
    val media = Multimodal.fakeMediaTable(spark, sf)
    val rows = Multimodal.resizeMedia(spark, media, maxSide = 64).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(math.max(r.out_width, r.out_height) <= 64)
      assert(r.out_width >= 1 && r.out_height >= 1)
      // aspect preserved within integer truncation
      val inAspect = r.width.toDouble / r.height
      val outAspect = r.out_width.toDouble / r.out_height
      assert(math.abs(inAspect - outAspect) / inAspect < 0.25)
      assert(r.n_bytes > 0)
    }
  }

  test("frame sampling keeps every stride-th frame") {
    val media = Multimodal.fakeMediaTable(spark, sf)
    val rows = Multimodal.sampleFrames(spark, media, frameBytes = 32, stride = 4)
      .collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.sampled === (r.n_frames + 3) / 4)
      assert(r.mean_luma > 0)
    }
  }
}
