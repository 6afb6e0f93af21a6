package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** At-scale evidence for the r9 auto-steepened MINHASH S-curve —
  * NgramAutoProbe's sibling (that one proved the char-ngram family;
  * minhash's AUTO shape only had spec-level rowHint coverage). Builds
  * a documents-ONLY k-replica of sf0.1 (ScaleProbe's marker-dilution
  * semantics: replica i weaves a unique token into every 5th word, so
  * cross-replica word-shingle Jaccard drops to ~0.25, under the 0.5
  * threshold — true pairs scale linearly, k x base) and times
  * [[Dedup.minhashPairs]] at the AUTO shape the corpus count resolves
  * to. Dev tool, not library surface.
  *
  * Usage: runMain graft.tools.MinhashAutoProbe [k] [alsoFixed]
  * (k defaults to 100 — 500k docs; pass "fixed" to ALSO time the
  * legacy 64/16 shape whose background term is quadratic by design.)
  */
object MinhashAutoProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.flatMap(_.toIntOption).getOrElse(100)
    val spark = GraftSession.local()
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val out = s"/tmp/graft_minhash_docs_x$k"
    if (!new java.io.File(s"$out/_COMPLETE_x$k").exists()) {
      val Off = 100000000L
      (0 until k).map { i =>
        val d = base.withColumn("doc_id", col("doc_id") + lit(i * Off))
        if (i == 0) d
        else d.withColumn("text", concat_ws(" ", expr(
          s"transform(split(text, ' '), (w, j) -> IF(j % 5 = 4, concat(w, ' zzz${i}qqq'), w))")))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/_COMPLETE_x$k"), "ok\n")
    }
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val n = docs.count()
    val (rows, bands) = (Dedup.autoMinhashRows(n), Dedup.autoMinhashBands(Dedup.autoMinhashRows(n)))
    println(s"[minhashprobe] n=$n auto shape: bands=$bands rows=$rows")
    // design-point (J >= 0.8) counts alongside totals: AUTO's steeper
    // curve may shed borderline pairs near the 0.5 threshold, but the
    // 0.999-recall guarantee is at J = 0.8 — those counts must agree
    def counts(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    def time(label: String)(body: => (Long, Long)): Unit = {
      val t0 = System.nanoTime()
      val (c, hi) = body
      println(f"[minhashprobe] $label%-10s pairs=$c%10d j80=$hi%8d  ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }
    time("auto")(counts(Dedup.minhashPairs(docs, "text", "doc_id", rowHint = n)))
    if (args.length > 1 && args(1) == "fixed")
      time("fixed64x16")(counts(Dedup.minhashPairs(docs, "text", "doc_id",
        numHashes = 64, bands = 16)))
    spark.stop()
  }
}
