package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import graft.functions.MinHash
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val grams = docs.select(col("doc_id").as("id"),
      MinHash.hashedCharNgrams(col("text"), 4).as("sh"))
    val banded = grams.select(col("id"),
      explode(MinHash.bandKeys(col("sh"), 12, 6, 77L)).as("bkey"))
    val cand = banded.as("l").join(banded.as("r"),
        col("l.bkey") === col("r.bkey") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b")).distinct()
    time("ngram candidates")(cand.count())
    time("ngram full")(Dedup.ngramJaccardPairs(docs, "text", "doc_id").count())
    time("minhash full")(Dedup.minhashPairs(docs, "text", "doc_id").count())
    spark.stop()
  }
}
