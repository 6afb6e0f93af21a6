package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Stage-level cost breakdown of the trained-semdedup pipeline
  * (d_semdedup_keep_trained, the suite's most expensive 100× row):
  * times quantizer training, pair generation, and label propagation
  * separately on the dir in arg(0) — so the optimization target is
  * measured, not guessed. Dev tool, not library surface. */
object SemTrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val emb = Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    val nlist = Similarity.autoNlistPairs(n)
    println(s"[semtrain] n=$n nlist=$nlist")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semtrain] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warm the input (isolate compute from first-touch IO)
    emb.write.format("noop").mode("overwrite").save()

    val cents = timed("trainQuantizer(3 rounds)") {
      Similarity.trainQuantizer(emb, "embedding", "vec_id", nlist, 3)
    }
    val centDf = {
      import spark.implicits._
      cents.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("seed_id", "sv")
    }
    val pairs = timed("semanticPairs(probes=4)") {
      val p = Dedup.semanticPairs(emb, "embedding", "vec_id",
        centroids = Some(centDf), probes = 4)
      p.write.format("noop").mode("overwrite").save()
      p
    }
    timed("clusters(+universe)") {
      Dedup.clusters(pairs, universe = Some(emb.select(col("vec_id"))))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
