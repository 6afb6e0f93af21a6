package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off calibration probe for the FULL-CORPUS graph-ANN keys:
  * measures layered-search recall@5 over the NN-descent-built index
  * (no vec_id cap) at each SF and descent-round count, so the
  * contract floors in d_ann_graph_full_recall /
  * d_ann_graph_full_insert_recall are pinned by measurement. */
object GraphFullProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-graph-full-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val nodes = Tables.load(spark, dir, "embeddings")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = nodes.count()
      val queries = nodes.filter(col("vec_id") < 10)
      val brute = Similarity.bruteTopK(nodes, queries, "embedding", "vec_id", k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true)
      val nBrute = brute.count()
      for ((gk, rounds, beam, srounds) <- Seq((12, 2, 48, 6))) {
        val (g, ug, entry) = Similarity.buildGraphIndexFull(
          nodes, "embedding", "vec_id", n, k = gk, rounds = rounds)
        val approx = Similarity.graphSearchTopKLayered(nodes, queries,
            g, ug, "embedding", "vec_id", k = 5, beam = beam,
            rounds = srounds, upperSeed = entry)
          .select(col("query_id"), col("neighbor_id"))
        val hits = brute.intersect(approx).count()
        println(s"PROBE dir=$dir n=$n gk=$gk rounds=$rounds beam=$beam " +
          s"srounds=$srounds recall=${100 * hits / nBrute} hits=$hits/$nBrute")
      }
      // delete leg: tombstone vec_id % 10 == 7, search k*3 deep,
      // drop tombstones, re-rank to 5; recall vs brute over survivors
      {
        val (g, ug, entry) = Similarity.buildGraphIndexFull(
          nodes, "embedding", "vec_id", n, k = 12, rounds = 2)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosm").desc, col("neighbor_id"))
        val approxD = Similarity.graphSearchTopKLayered(nodes, queries,
            g, ug, "embedding", "vec_id", k = 15, beam = 48, rounds = 6,
            upperSeed = entry)
          .filter(pmod(col("neighbor_id"), lit(10)) =!= 7)
          .withColumn("rnk2", row_number().over(w).cast("long"))
          .filter(col("rnk2") <= 5)
          .select(col("query_id"), col("neighbor_id"))
          .localCheckpoint(true)
        val survivors = nodes.filter(pmod(col("vec_id"), lit(10)) =!= 7)
        val bruteD = Similarity.bruteTopK(survivors, queries,
            "embedding", "vec_id", k = 5)
          .select(col("query_id"), col("neighbor_id"))
          .localCheckpoint(true)
        val nb = bruteD.count()
        val hd = bruteD.intersect(approxD).count()
        println(s"PROBE-DELETE dir=$dir n=$n recall=${100 * hd / nb} " +
          s"hits=$hd/$nb returned=${approxD.count()}")
      }
      // insert split: base 80%, delta 20%
      val split = n * 4 / 5
      val base = nodes.filter(col("vec_id") < split)
      val delta = nodes.filter(col("vec_id") >= split)
      val (bg, bug, entry) = Similarity.buildGraphIndexFull(
        base, "embedding", "vec_id", split, k = 12, rounds = 2)
      val inserts = Similarity.graphSearchTopKLayered(base, delta,
          bg, bug, "embedding", "vec_id", k = 12, beam = 48, rounds = 6,
          upperSeed = entry)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true)
      val merged = bg.union(inserts)
      val approxM = Similarity.graphSearchTopKLayered(nodes, queries,
          merged, bug, "embedding", "vec_id", k = 5, beam = 48, rounds = 6,
          upperSeed = entry)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true)
      val hitsM = brute.intersect(approxM).count()
      val bruteNew = brute.filter(col("neighbor_id") >= split)
        .localCheckpoint(true)
      val nNew = bruteNew.count()
      val newCov = bruteNew.intersect(approxM).count()
      println(s"PROBE-INSERT dir=$dir n=$n split=$split recall=" +
        s"${100 * hitsM / nBrute} hits=$hitsM/$nBrute new=$newCov/$nNew")
      nodes.unpersist()
    }
    spark.stop()
  }
}
