package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-linearity probe: materialize a 10x replica of the sf0.1
  * tables (keys shifted per replica; document text and embedding
  * vectors perturbed so the dup/neighbor structure stays realistic
  * instead of every row gaining 9 exact clones), then time the
  * top-cost queries at 1x and 10x. A healthy 100 TB-shaped plan shows
  * <= ~10x wall time at 10x rows; anything super-linear is a shuffle
  * or buffering bug. Dev tool, not library surface.
  *
  * Usage: runMain graft.tools.ScaleProbe [outDir] [query ...]
  */
object ScaleProbe {
  private val Off = 100000000L // replica key offset, clear of real ids

  private def replicate(spark: SparkSession, base: String, out: String, k: Int): Unit = {
    def t(name: String): DataFrame = spark.read.parquet(s"$base/$name.parquet")
    def w(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[probe] wrote $name x$k")
    }
    def shifted(df: DataFrame, key: String)(extra: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map { i =>
        extra(df.withColumn(key, col(key) + lit(i * Off)), i)
      }.reduce(_ unionByName _)

    w(shifted(t("lineitem"), "l_orderkey")((d, _) => d), "lineitem")
    w(shifted(t("orders"), "o_orderkey")((d, _) => d), "orders")
    // user_id shifts too so per-user state (sessions, running totals)
    // scales in keys, not just rows per key
    w(shifted(t("events"), "event_id")((d, i) =>
      d.withColumn("user_id", col("user_id") + lit(i * Off))), "events")
    // per-replica text marker: replicas are near-dups of each other's
    // docs only as much as the base corpus already was
    w(shifted(t("documents"), "doc_id")((d, i) =>
      d.withColumn("text", concat(col("text"), lit(s" replica$i")))), "documents")
    // deterministic per-replica jitter (~1% of unit norm) keeps ANN
    // neighborhoods intact without manufacturing exact-dup vectors
    w(shifted(t("embeddings"), "vec_id")((d, i) =>
      d.withColumn("embedding", expr(
        s"transform(embedding, (x, j) -> CAST(x + sin(vec_id * 31 + j * 7 + $i * 13) * 0.01 AS FLOAT))"))),
      "embeddings")
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_sfx1")
    val probes =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_percentiles", "k_avro_roundtrip", "d_dedup_embed",
        "d_dedup_embed_recall", "d_dedup_clusters", "q1_agg")
    val spark = GraftSession.local()
    val base = "/root/testdata/sf0.1"
    if (!new java.io.File(s"$out/embeddings.parquet").exists())
      replicate(spark, base, out, 10)

    def time(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    probes.foreach { q => time(base, q); () } // warm code paths
    println(f"[probe] ${"query"}%-22s ${"1x"}%8s ${"10x"}%8s ratio")
    probes.foreach { q =>
      val t1 = time(base, q)
      val t10 = time(out, q)
      println(f"[probe] $q%-22s $t1%8.2f $t10%8.2f ${t10 / t1}%5.1f")
    }
    spark.stop()
  }
}
