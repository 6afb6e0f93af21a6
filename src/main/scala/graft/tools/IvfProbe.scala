package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Dev probe for IVF quality at an explicit quantizer size on any
  * table dir (typically a ScaleProbe replica): recall vs brute and the
  * within-eps precision of returned neighbors, printed one line. The
  * round-5 verdict's autoNlist "done" criterion — recall/precision
  * still healthy at nlist 256 on the 10x (~sf1) replica — is checked
  * with this. Dev tool, not library surface.
  *
  * Usage: runMain graft.tools.IvfProbe [dir] [nlist] [nprobe]
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sfx1")
    val nlist = args.lift(1).map(_.toInt).getOrElse(256)
    val nprobe = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = GraftSession.local()
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteTopK(emb, q, "embedding", "vec_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ivf = Similarity
      .ivfTopK(emb, q, "embedding", "vec_id", k = 5, nlist = nlist, nprobe = nprobe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val bruteSet = brute.map(t => (t._1, t._2)).toSet
    val recall = ivf.count(t => bruteSet((t._1, t._2))).toDouble / brute.length
    val kth = brute.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val withinEps = ivf.count(t => t._3 >= kth(t._1) - 0.05).toDouble / ivf.length
    println(f"[ivfprobe] dir=$dir nlist=$nlist nprobe=$nprobe n=${emb.count()} " +
      f"returned=${ivf.length} recall=$recall%.3f withinEps=$withinEps%.3f")
    spark.stop()
  }
}
