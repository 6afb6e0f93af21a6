package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Dev probe: measured PQ recall@5 and ADC-cosine error vs exact, to
  * set contract thresholds with margin. Usage: runMain graft.tools.PqProbe [sfDir] */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val pq = Similarity.pqTopK(emb, q, "embedding", "vec_id")
    val exact = Similarity.bruteTopK(emb, q, "embedding", "vec_id")
    val nExact = exact.count()
    def recall(approx: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val hits = approx.as("a").join(exact.as("e"),
          col("a.query_id") === col("e.query_id") &&
            col("a.neighbor_id") === col("e.neighbor_id")).count()
      println(s"[pq] $tag recall@5 = ${hits.toDouble / nExact} ($hits / $nExact)")
    }
    recall(pq, "raw-adc")
    recall(Similarity.pqTopK(emb, q, "embedding", "vec_id", rerank = 50), "rerank50")
    recall(Similarity.pqTopK(emb, q, "embedding", "vec_id", rerank = 100), "rerank100")
    val withQv = pq.join(q.select(col("vec_id").as("query_id"),
      col("embedding").as("qv")), "query_id")
    val err = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .join(withQv, "neighbor_id")
      .select(abs(col("cos_pq") - org.apache.spark.sql.graft.Bridge.column(
        graft.plans.CosineSim(
          org.apache.spark.sql.graft.Bridge.expression(col("qv")),
          org.apache.spark.sql.graft.Bridge.expression(col("cv"))))).as("err"))
      .agg(avg(col("err")).as("mean"), max(col("err")).as("max")).head()
    println(s"[pq] adc err mean=${err.getDouble(0)} max=${err.getDouble(1)}")
    spark.stop()
  }
}
