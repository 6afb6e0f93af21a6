package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** One-off measurement: IVF-PQ reranked recall vs brute at the
  * contract shape, per SF — run before pinning contract thresholds
  * (memory rule: measure at BOTH SFs first). Dev tool. */
object IvfPqMeasure {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteTopK(emb, q, "embedding", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivfpq = Similarity.ivfPqTopK(emb, q, "embedding", "vec_id",
          nlist = 16, nprobe = 4, rerank = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = Similarity.ivfTopK(emb, q, "embedding", "vec_id",
          nlist = 16, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[ivfpq] $dir recall=${(brute intersect ivfpq).size.toDouble / brute.size}" +
        s" flat=${(brute intersect ivf).size.toDouble / brute.size}")
    }
    spark.stop()
  }
}
