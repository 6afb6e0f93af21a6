package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Measurement harness behind the d_semdedup_recall contract floor:
  * cluster-blocked pair recall of [[Dedup.semanticPairs]] vs the
  * brute-force tau-pair set, per quantizer (seeds-by-id vs trained
  * k-means at several Lloyd budgets). Dev tool, not library surface —
  * run at each SF, pin the contract floor under the worst measured
  * value (the r7 PQ-contract methodology).
  */
object SemRecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    import spark.implicits._
    for (dir <- dirs) {
      val emb = Tables.load(spark, dir, "embeddings")
      val n = emb.count()
      // full-corpus truth AND the contract's capped (vec_id < 1000)
      // truth — the driver row floors against the capped one
      val truthAll = Dedup.bruteEmbeddingPairs(emb, "embedding", "vec_id")
        .select(col("id_a"), col("id_b"), col("cos")).cache()
      truthAll.count()
      val truthCap = truthAll
        .filter(col("id_a") < 1000 && col("id_b") < 1000).cache()
      truthCap.count()
      def recallOf(truth: org.apache.spark.sql.DataFrame,
          found: org.apache.spark.sql.DataFrame, tau: Double): (Long, Double) = {
        val t = truth.filter(col("cos") >= tau)
        val nTrue = t.count()
        val hit = t.join(found.select("id_a", "id_b"), Seq("id_a", "id_b")).count()
        (nTrue, hit.toDouble / math.max(nTrue, 1L))
      }
      for (k <- Seq(16, Similarity.autoNlist(n)); iters <- Seq(3);
           p <- Seq(1, 2, 3, 4)) {
        val cents = Similarity.trainQuantizer(emb, "embedding", "vec_id", k, iters)
        val centDf = cents.toSeq.zipWithIndex
          .map { case (v, i) => (i.toLong, v) }.toDF("seed_id", "sv")
        val found = Dedup.semanticPairs(emb, "embedding", "vec_id",
          centroids = Some(centDf), probes = p).cache()
        val nFound = found.count()
        val (nt, r) = recallOf(truthAll, found, 0.35)
        val (ntc, rc) = recallOf(truthCap, found, 0.35)
        println(f"[semrecall] $dir n=$n k=$k iters=$iters probes=$p " +
          f"n_true=$nt n_found=$nFound recall=$r%.4f " +
          f"capped_true=$ntc capped_recall=$rc%.4f")
        found.unpersist()
      }
      truthCap.unpersist()
      truthAll.unpersist()
    }
    spark.stop()
  }
}
