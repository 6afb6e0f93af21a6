package graft.tools

import graft.GraftSession
import graft.operators.{Pipeline, Similarity, StreamQueries}
import org.apache.spark.sql.functions._

/** Stage-level cost breakdown of s_ann_ingest (the suite's most
  * expensive key): times store build/read, anchor + input writes, the
  * streaming drain (4 insertAnnBatch micro-batches), the merged
  * search, and the verification legs separately — so the optimization
  * target is measured, not guessed. Dev tool, not library surface. */
object SAnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sann] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
    }
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_sann_probe"
    rmTree(new java.io.File(base))
    val emb = graft.Tables.load(s, dir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val baseNodes = emb.filter(!Pipeline.graphDelta(col("vec_id")))
    val delta = emb.filter(Pipeline.graphDelta(col("vec_id")))
    val nDelta = timed("delta.count")(delta.count())
    val (baseGraph, baseUpper, entry, _, _) =
      timed("graphIndexStore(base)")(Pipeline.graphIndexStore(s, dir, "base"))
    timed("anchor v0 write") {
      baseGraph.select(col("query_id"), col("neighbor_id"))
        .write.mode("overwrite").parquet(s"$base/store/v0")
    }
    val nb = 4
    timed("input file writes x4") {
      (0 until nb).foreach { i =>
        delta.filter(pmod(expr("vec_id div 5"), lit(nb)) === i)
          .coalesce(1).write.mode("overwrite").parquet(s"$base/in/f$i")
      }
    }
    timed("stream drain (4 batches)") {
      val q = s.readStream
        .schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          StreamQueries.insertAnnBatch(s"$base/store", baseNodes, baseGraph,
            baseUpper, entry, batch, batchId)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val merged = StreamQueries.readAnnChain(s, s"$base/store")
    val queries = emb.filter(col("vec_id") < 10)
    val approx = timed("merged layered search") {
      Similarity.graphSearchTopKLayered(emb, queries,
          merged, baseUpper, "embedding", "vec_id", k = 5, beam = 48,
          rounds = 6, upperSeed = entry)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(eager = true)
    }
    val brute = timed("brute truth") {
      Similarity.bruteTopK(emb, queries, "embedding", "vec_id", k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(eager = true)
    }
    timed("covered count") {
      merged.filter(pmod(col("query_id"), lit(5)) === 4)
        .select(col("query_id")).distinct().count()
    }
    timed("final agg") {
      brute.agg(countDistinct(col("query_id")).as("n_queries"),
          count(lit(1)).as("n_brute"))
        .crossJoin(brute.intersect(approx).agg(count(lit(1)).as("hits")))
        .select(col("n_queries"), col("hits"), lit(nDelta))
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
