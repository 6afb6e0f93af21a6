package graft.tools

import graft.GraftSession
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Measurement behind m_modal_phash_contract's pinned thresholds:
  * intra-group (same photo, five scales) and inter-group (different
  * photos) Hamming-distance distributions of the 64-bit DCT pHash
  * over the near-dup camera roll. The intra/adjacent-inter legs are
  * [[Multimodal.phashDistances]] — the SAME DataFrames the contract
  * row aggregates, so the measurement and the contract cannot drift
  * apart; only the full cross-group matrix (quadratic in groups) is
  * probe-only. Run per SF dir:
  *
  *   sbt "runMain graft.tools.PhashProbe /root/testdata/sf0.01"
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    val h = Multimodal.phashMedia(spark, Multimodal.phashMediaTable(spark, dir))
      .select(col("doc_id"), col("group_id"), col("phash_bits")).cache()

    val (intra, inter) = Multimodal.phashDistances(h)
    // full cross-group distribution too (quadratic in groups — probe-only)
    val reps = h.filter(col("doc_id") === col("group_id"))
    val interAll = reps.as("a").join(reps.as("b"),
      col("a.group_id") < col("b.group_id"))
      .select(expr("bit_count(a.phash_bits ^ b.phash_bits)").as("d"))

    def stats(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val r = df.agg(count(lit(1)), min("d"), max("d"),
        round(avg("d"), 2)).collect()(0)
      println(s"[phash] $name n=${r.get(0)} min=${r.get(1)} " +
        s"max=${r.get(2)} mean=${r.get(3)}")
    }
    stats("intra", intra)
    stats("inter-adjacent", inter)
    stats("inter-all", interAll)
    spark.stop()
  }
}
