package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import graft.plans.CosineSim

/** Measurement harness behind the d_ann_sq_recall / d_ann_sq_fidelity
  * contract floors: raw-score (no-rerank) recall vs brute-force exact
  * top-k, and mean |cos_sq - cos| over the returned neighbors, per SF.
  * Dev tool, not library surface — run at each SF, pin the floors
  * under/over the worst measured value (the r7 PQ-contract
  * methodology).
  */
object Sq8Probe {
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
      val sq = Similarity.sq8TopK(emb, q, "embedding", "vec_id").cache()
      val hit = exact.join(sq.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count()
      val recall = hit.toDouble / math.max(nExact, 1L)
      val ivfsq = Similarity.ivfSqTopK(emb, q, "embedding", "vec_id",
        nlist = 16, nprobe = 4)
      val ivfsqHit = exact.join(ivfsq.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count()
      println(f"[ivfsq] $dir recall=${ivfsqHit.toDouble / math.max(nExact, 1L)}%.4f")
      for (r <- Seq(16, 32, 48); short <- Seq(100, 200)) {
        val rp = Similarity.rpTopK(emb, q, "embedding", "vec_id",
          r = r, shortlist = short)
        val rpHit = exact.join(rp.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id")).count()
        println(f"[rp] $dir r=$r short=$short " +
          f"recall=${rpHit.toDouble / math.max(nExact, 1L)}%.4f")
      }
      val withQ = sq.join(broadcast(q.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))), "query_id")
      val err = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        .join(broadcast(withQ), "neighbor_id")
        .select(abs(col("cos_sq") -
          Bridge.column(CosineSim(Bridge.expression(col("qv")),
            Bridge.expression(col("cv"))))).as("err"))
        .agg(avg(col("err")).as("mean_err"), max(col("err")).as("max_err"))
        .head()
      println(f"[sq8] $dir n=$n recall=$recall%.4f " +
        f"mean_err=${err.getDouble(0)}%.6f max_err=${err.getDouble(1)}%.6f")
      // PCA: explained-variance ratio and reduce-then-rerank recall
      // across (r, shortlist) — floor methodology inputs. Model and
      // residual pass depend only on r; only the top-k reruns per
      // shortlist.
      for (r <- Seq(16, 24, 32)) {
        val model = Similarity.trainPca(emb, "embedding", r = r)
        val meanRes = Similarity.pcaResidual2(emb, "embedding", model)
          .agg(avg(col("residual2"))).head().getDouble(0)
        for (short <- Seq(50, 100)) {
          val pca = Similarity.pcaTopK(emb, q, "embedding", "vec_id",
            shortlist = short, model = Some(model))
          val pcaHit = exact.join(pca.select(col("query_id"), col("neighbor_id")),
            Seq("query_id", "neighbor_id")).count()
          println(f"[pca] $dir n=$n r=$r short=$short " +
            f"explained=${model.explainedRatio}%.4f " +
            f"recall=${pcaHit.toDouble / math.max(nExact, 1L)}%.4f " +
            f"identity_gap=${math.abs(meanRes - (model.totalVar - model.eigenvalues.sum)) / math.max(model.totalVar, 1.0)}%.3e")
        }
      }
      exact.unpersist(); sq.unpersist()
    }
    spark.stop()
  }
}
