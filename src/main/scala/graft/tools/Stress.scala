package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** One-off scale probe: replicate the sf0.1 documents table 10x with
  * shifted ids (~50k docs, each replica's near-dup structure intact)
  * and run the dedup family — checks candidate volume and wall time
  * grow linearly, not quadratically. Dev tool, not library surface. */
object Stress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val docs0 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val n = docs0.count()
    val docs = (0 until 10).map { i =>
      docs0.select((col("doc_id") + lit(i * 10000L)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"))
    }.reduce(_ unionByName _).cache()
    println(s"[stress] docs: ${docs.count()} (base $n)")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$r")
    }
    // pinned to the legacy shapes the tool's historical linearity
    // numbers were measured on — AUTO would also bill its sizing
    // count() to the timed region
    time("minhash")(Dedup.minhashPairs(docs, "text", "doc_id",
      numHashes = 64, bands = 16).count())
    time("ngram")(Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      bands = 12, rows = 6).count())
    time("simhash")(Dedup.simhashPairs(docs, "text", "doc_id").count())
    time("exact")(Dedup.exact(docs, "text", "doc_id").count())
    spark.stop()
  }
}
