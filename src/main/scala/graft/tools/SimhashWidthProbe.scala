package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** At-scale cost/coverage comparison of the two simhash widths on the
  * MinhashAutoProbe 100x documents replica (500k docs): the 64-bit
  * 4x16 pigeonhole at its exact radius 3 vs the 128-bit 8x16 at its
  * exact radius 7. Pins the scaladoc's claim that the wider kernel's
  * verify term grows ~2x (8 vs 4 bands on the same 2^16 key space)
  * while buying twice the exact radius. Dev tool, not library
  * surface.
  *
  * Usage: runMain graft.tools.SimhashWidthProbe [replicaDir]
  */
object SimhashWidthProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_minhash_docs_x100")
    val spark = GraftSession.local()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    println(s"[simhashwidth] n=$n")
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = body
      println(f"[simhashwidth] $label%-12s pairs=$c%10d  ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }
    time("64/h3")(Dedup.simhashPairs(docs, "text", "doc_id").count())
    time("128/h7")(Dedup.simhashPairs(docs, "text", "doc_id",
      maxHamming = 7, bits = 128).count())
    spark.stop()
  }
}
