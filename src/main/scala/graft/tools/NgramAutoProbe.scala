package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** One-shot evidence tool for the r9 auto-steepened ngram S-curve:
  * times [[Dedup.ngramJaccardPairs]] on a ScaleProbe replica dir at
  * BOTH the legacy fixed 12x6 shape and the AUTO shape the corpus
  * count resolves to. The fixed shape filled the disk at the 100x
  * replica (bands * J_bg^rows * n^2/2 with the replica's hot ~0.25-0.55
  * cross-copy gram background); AUTO steepens rows with n and must
  * complete. Dev tool, not library surface.
  *
  * Usage: runMain graft.tools.NgramAutoProbe [replicaDir] [alsoFixed]
  * (pass "fixed" as the 2nd arg to ALSO time the legacy shape — it may
  * fill the disk by design; default times AUTO only.)
  */
object NgramAutoProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sfx100")
    val spark = GraftSession.local()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val r = Dedup.autoNgramRows(n)
    val b = Dedup.autoNgramBands(r)
    println(s"[ngramprobe] n=$n auto shape: bands=$b rows=$r")
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = body
      println(f"[ngramprobe] $label%-10s pairs=$c%10d  ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }
    time("auto")(Dedup.ngramJaccardPairs(docs, "text", "doc_id", rowHint = n).count())
    if (args.length > 1 && args(1) == "fixed")
      time("fixed12x6")(Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        bands = 12, rows = 6).count())
    spark.stop()
  }
}
