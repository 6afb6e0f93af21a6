package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Measurement harness behind the d_ann_{lsh,ivf}_auto_recall contract
  * floors: recall of the AUTO-shaped paths (autoBits / autoNlist — the
  * shapes a user gets with no tuning) vs brute-force exact top-k, per
  * SF. Dev tool, not library surface — run at each SF, pin the
  * contract floor under the worst measured value (the r7 PQ-contract
  * methodology).
  */
object AnnAutoRecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    for (dir <- dirs) {
      val emb = Tables.load(spark, dir, "embeddings")
      val n = emb.count()
      val q = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteTopK(emb, q, "embedding", "vec_id")
        .select(col("query_id"), col("neighbor_id")).cache()
      val nExact = exact.count()
      def recallOf(approx: org.apache.spark.sql.DataFrame): Double = {
        val hit = exact.join(approx.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id")).count()
        hit.toDouble / math.max(nExact, 1L)
      }
      val lsh = recallOf(Similarity.lshTopK(emb, q, "embedding", "vec_id"))
      val ivf = recallOf(Similarity.ivfTopK(emb, q, "embedding", "vec_id"))
      val (cBg, cTrue) = Similarity.measureDensity(emb, "embedding", "vec_id")
      val shape = Similarity.autoLshShape(n, cBg, cTrue)
      println(f"[annauto] $dir n=$n lsh_auto=$lsh%.4f ivf_auto=$ivf%.4f " +
        f"(cBg=$cBg%.3f cTrue=$cTrue%.3f lshShape=${shape.tables}x${shape.bits} " +
        f"autoNlist=${Similarity.autoNlist(n)})")
      exact.unpersist()
    }
    spark.stop()
  }
}
