package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Dev probe: measured recall@5 of the ROUTED sharded graph search
  * vs brute truth on the standard probe set, per SF dir, at a sweep
  * of probeShards — the number the d_ann_graph_routed_recall floor
  * (0.8 at w=2) is calibrated against. Dev tool, not library
  * surface. */
object RoutedProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    dirs.foreach { dir =>
      val emb = Tables.load(spark, dir, "embeddings")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = emb.count()
      val shards = sys.env.get("RP_SHARDS").map(_.toInt).getOrElse(Similarity.autoRoutedShards(n))
      val (g, entries, cents) = Similarity.buildGraphIndexRouted(
        emb, "embedding", "vec_id", shards, k = 12, rounds = 2, lloydIters = sys.env.get("RP_LLOYD").map(_.toInt).getOrElse(1))
      val q = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteTopK(emb, q, "embedding", "vec_id", k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true)
      val nBrute = brute.count()
      for (w <- Seq(1, 2, 3, 4)) {
        val approx = Similarity.graphSearchTopKRouted(emb, q, g,
            entries, cents, "embedding", "vec_id", k = 5,
            beamPerShard = 16, rounds = 6, probeShards = w)
          .select(col("query_id"), col("neighbor_id"))
        val hits = brute.intersect(approx).count()
        println(f"[routed] $dir%-28s shards=$shards w=$w recall@5 = " +
          f"${hits * 100.0 / nBrute}%5.1f%%")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
object RoutedOccupancy {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = Tables.load(spark, dir, "embeddings").cache()
    val n = emb.count()
    for (shards <- Seq(8, 12, 16)) {
      val cents = Similarity.trainQuantizer(emb, "embedding", "vec_id", shards, 1)
      val occ = Similarity.shardAssign(emb, "embedding", "vec_id", cents)
        .groupBy("shard").count().orderBy(desc("count")).collect()
      println(s"[occ] $dir shards=$shards n=$n -> " +
        occ.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
    }
    spark.stop()
  }
}
object FilteredGraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.load(spark, dir, "embeddings").cache()
      val n = emb.count()
      val (g, u, e) = Similarity.buildGraphIndexFull(
        emb, "embedding", "vec_id", n, k = 12, rounds = 2)
      val q = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteTopKFiltered(emb, q, "embedding", "vec_id", "label")
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val nb = brute.count()
      for (beam <- Seq(48, 96)) {
        val ap = Similarity.graphSearchTopKLayeredFiltered(emb, q, g, u,
            "embedding", "vec_id", "label", k = 5, beam = beam,
            rounds = 6, upperSeed = e)
          .select(col("query_id"), col("neighbor_id"))
        println(f"[fgp] $dir beam=$beam recall = ${brute.intersect(ap).count() * 100.0 / nb}%5.1f%% (n_exact=$nb)")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
object RoutedIngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.load(spark, dir, "embeddings").cache()
      val baseNodes = emb.filter(pmod(col("vec_id"), lit(5)) =!= 4)
      val delta = emb.filter(pmod(col("vec_id"), lit(5)) === 4)
      val nBase = baseNodes.count()
      val shards = Similarity.autoRoutedShards(nBase)
      val (g, entries, cents) = Similarity.buildGraphIndexRouted(
        baseNodes, "embedding", "vec_id", shards, k = 12, rounds = 2)
      val q = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteTopK(emb, q, "embedding", "vec_id", k = 5)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val nb = brute.count()
      for ((ik, ib) <- Seq((12, 24))) {
        val ins = Similarity.graphSearchTopKAssigned(baseNodes, delta, g,
            entries, cents, "embedding", "vec_id", k = ik,
            beamPerShard = ib, rounds = 6)
          .select(col("query_id"), col("neighbor_id"))
        val merged = g.select(col("query_id"), col("neighbor_id"))
          .union(ins).localCheckpoint(true)
        for ((w, bps) <- Seq((3, 24), (4, 16), (4, 24))) {
          val ap = Similarity.graphSearchTopKRouted(emb, q, merged,
              entries, cents, "embedding", "vec_id", k = 5,
              beamPerShard = bps, rounds = 6, probeShards = w)
            .select(col("query_id"), col("neighbor_id"))
          println(f"[rip] $dir ik=$ik ib=$ib w=$w bps=$bps recall = ${brute.intersect(ap).count() * 100.0 / nb}%5.1f%%")
        }
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
object RoutedDeleteProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    import org.apache.spark.sql.expressions.Window
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.load(spark, dir, "embeddings").cache()
      val n = emb.count()
      val shards = Similarity.autoRoutedShards(n)
      val (g, entries, cents) = Similarity.buildGraphIndexRouted(
        emb, "embedding", "vec_id", shards, k = 12, rounds = 2)
      val q = emb.filter(col("vec_id") < 10)
      val surv = emb.filter(pmod(col("vec_id"), lit(10)) =!= 7)
      val brute = Similarity.bruteTopK(surv, q, "embedding", "vec_id", k = 5)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val nb = brute.count()
      val w5 = Window.partitionBy(col("query_id"))
        .orderBy(col("cosm").desc, col("neighbor_id"))
      for (w <- Seq(2, 3)) {
        val ap = Similarity.graphSearchTopKRouted(emb, q, g, entries,
            cents, "embedding", "vec_id", k = 15, beamPerShard = 16,
            rounds = 6, probeShards = w)
          .filter(pmod(col("neighbor_id"), lit(10)) =!= 7)
          .withColumn("rnk2", row_number().over(w5).cast("long"))
          .filter(col("rnk2") <= 5)
          .select(col("query_id"), col("neighbor_id"))
        println(f"[rdp] $dir w=$w recall = ${brute.intersect(ap).count() * 100.0 / nb}%5.1f%%")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
object RoutedFilteredProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.load(spark, dir, "embeddings").cache()
      val n = emb.count()
      val shards = Similarity.autoRoutedShards(n)
      val (g, entries, cents) = Similarity.buildGraphIndexRouted(
        emb, "embedding", "vec_id", shards, k = 12, rounds = 2)
      val q = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteTopKFiltered(emb, q, "embedding", "vec_id", "label")
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val nb = brute.count()
      for ((w, bps) <- Seq((2, 48), (3, 48), (4, 48), (3, 96))) {
        val ap = Similarity.graphSearchTopKRoutedFiltered(emb, q, g,
            entries, cents, "embedding", "vec_id", "label", k = 5,
            beamPerShard = bps, rounds = 6, probeShards = w)
          .select(col("query_id"), col("neighbor_id"))
        println(f"[rfp] $dir w=$w bps=$bps recall = ${brute.intersect(ap).count() * 100.0 / nb}%5.1f%% (nb=$nb)")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
