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
}
