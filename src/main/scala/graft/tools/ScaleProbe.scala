package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-linearity probe: materialize a 10x replica of the sf0.1
  * tables (~ sf1), then time queries at 1x and 10x. A healthy
  * 100 TB-shaped plan shows <= ~10x wall time at 10x rows; anything
  * super-linear is a shuffle or buffering bug. Dev tool, not library
  * surface.
  *
  * Replica semantics preserve PER-REPLICA structure while keeping
  * CROSS-REPLICA similarity at background level, so the true answer of
  * every dedup/ANN query scales linearly (10x the pairs), not
  * quadratically (45 cross-replica pairs per base row) — without this
  * the probe would measure output explosion, a property of a lazy
  * replica generator, not of the plans:
  *
  *  - documents: replica i > 0 weaves a replica-unique marker token in
  *    every 5th word AND applies a replica-unique character BIJECTION
  *    (a seeded permutation of the full alphabet — 26! transforms, so
  *    every replica's map is distinct at ANY replica count). A
  *    bijection maps each replica's gram/word sets one-to-one, so
  *    WITHIN-replica Jaccard (word or char-gram) is preserved
  *    EXACTLY, while cross-replica char-4-gram overlap collapses to
  *    near zero. The r13 marker-only weave left
  *    cross-replica char-gram Jaccard ~0.55 — right at the 12x6
  *    banding's S-curve midpoint, so d_dedup_ngram's 10x row (4.4x)
  *    measured candidate-pair mass the device itself injected, not
  *    the plan (the r13 verdict's decorrelation finding).
  *  - events: replica i shifts ts by i * (base span + 10 min) — each
  *    replica occupies a DISJOINT time domain, so interval/sweep
  *    operators (q_range_join's error windows) match only their own
  *    replica's events and true pair mass scales linearly. With the
  *    shared axis, matched pairs grew exactly k² (measured 479,031 →
  *    47,903,100 at k=10) — output explosion from the device, not the
  *    plan (q_range_join's 4.3x wall-clock against 100x output was
  *    already strongly sub-linear).
  *  - embeddings: replica i rotates the dimension axes by 7*i — a
  *    norm- and distance-preserving permutation, so each replica's
  *    neighborhoods are exactly the base ones, while cross-replica
  *    cosine falls to background (a vector vs its rotation is
  *    effectively a random pair).
  *  - keys (orderkey, event_id, user_id, doc_id, vec_id) shift by
  *    i * 1e8; bounded dims (region, nation, customer, supplier, part)
  *    copy unchanged, so fact->dim joins stay valid and dims grow
  *    slower than facts, the realistic scale shape.
  */
object ScaleProbe {
  private val Off = 100000000L // replica key offset, clear of real ids

  private def replicate(spark: SparkSession, base: String, out: String, k: Int): Unit = {
    // drop ALL completion markers BEFORE the first write: an
    // interrupted cross-factor rebuild must leave a dir no factor's
    // skip guard will accept (a marker removed only at the end would
    // keep validating the old factor while tables are half-overwritten).
    // Every GENERATION of marker goes (V2/V3/V4/...), not just the
    // current one — stale old-generation markers are inert to the skip
    // guard but misleading state in a rebuilt dir.
    Option(new java.io.File(out).listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(_.getName.startsWith("_REPLICA_COMPLETE")).foreach(_.delete())
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
    // scales in keys, not just rows per key; ts shifts each replica to
    // a disjoint time domain (see scaladoc). Events go through
    // Tables.load so ts rides the long-nanos contract (the base file
    // is a microsecond timestamp; the replica persists the normalized
    // LONG, which Tables.load passes through unchanged).
    val ev = graft.Tables.load(spark, base, "events")
    val evBounds = ev.agg(min(col("ts")), max(col("ts"))).collect()(0)
    val evSpan = evBounds.getLong(1) - evBounds.getLong(0) +
      600L * 1000000000L // + the widest interval any operator opens
    w(shifted(ev, "event_id")((d, i) =>
      d.withColumn("user_id", col("user_id") + lit(i * Off))
        .withColumn("ts", col("ts") + lit(i * evSpan))), "events")
    // replica-unique marker + character bijection (see scaladoc).
    // The bijection is a SEEDED PERMUTATION of the full alphabet
    // (26! >> any replica count), not a rotation: a rotation's period
    // caps the distinct transforms, and at k=100 the first cut
    // (rotate 'abcdefghij' by i%10) put every 10th replica back on a
    // SHARED bijection — their cross-pairs sat at the banding S-curve
    // midpoint again and d_dedup_ngram's exact-verify gram join
    // spilled the disk to death. Lower and upper case both map (the
    // dedup kernels lower() first — an unmapped uppercase letter
    // would leak identity grams through the lowering).
    def permAlpha(i: Int): (String, String) = {
      val lower = "abcdefghijklmnopqrstuvwxyz"
      val p = new scala.util.Random(0xC0FFEE + i)
        .shuffle(lower.toList).mkString
      (lower + lower.toUpperCase, p + p.toUpperCase)
    }
    w(shifted(t("documents"), "doc_id")((d, i) =>
      if (i == 0) d
      else {
        val (from, to) = permAlpha(i)
        d.withColumn("text", translate(concat_ws(" ", expr(
            s"transform(split(text, ' '), (w, j) -> IF(j % 5 = 4, concat(w, ' zzz${i}qqq'), w))")),
          from, to))
      }),
      "documents")
    // per-replica axis rotation (see scaladoc)
    w(shifted(t("embeddings"), "vec_id")((d, i) =>
      if (i == 0) d
      else d.withColumn("embedding", expr(
        s"transform(embedding, (x, j) -> element_at(embedding, CAST((j + ${7 * i}) % size(embedding) AS INT) + 1))"))),
      "embeddings")
    for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
      w(t(dim), dim)
    // completion marker, written LAST: the skip guard keys on it so an
    // interrupted replicate() or a dir from an older ScaleProbe version
    // (different replica semantics, no dim tables, different factor) is
    // rebuilt, not reused
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/${marker(k)}"), "ok\n")
  }

  // factor is part of the marker so a 10x dir is never mistaken for 30x
  private def marker(k: Int): String =
    if (k == 10) "_REPLICA_COMPLETE_V4" else s"_REPLICA_COMPLETE_V4_x$k"

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_sfx1")
    // SPARK_GRAFT_REPLICAS=30 probes deeper than the default 10x —
    // round-5 verdict: one more datapoint on the >=2.0x tail separates
    // fixed costs amortizing from a hidden super-linear term
    val k = sys.env.get("SPARK_GRAFT_REPLICAS").flatMap(_.toIntOption).getOrElse(10)
    val probes =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local()
    val base = "/root/testdata/sf0.1"
    if (!new java.io.File(s"$out/${marker(k)}").exists())
      replicate(spark, base, out, k)

    def time(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // pre-render both dirs' media tables (input synthesis, not query
    // work — same reasoning as Bench's warmup) and warm code paths
    try {
      graft.operators.Multimodal.fakeMediaTable(spark, base)
        .write.mode("overwrite").format("noop").save()
      graft.operators.Multimodal.fakeMediaTable(spark, out)
        .write.mode("overwrite").format("noop").save()
      if (probes.exists(_.startsWith("m_modal_phash"))) {
        graft.operators.Multimodal.phashMediaTable(spark, base)
          .write.mode("overwrite").format("noop").save()
        graft.operators.Multimodal.phashMediaTable(spark, out)
          .write.mode("overwrite").format("noop").save()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
    probes.foreach { q => time(base, q); () } // warm code paths
    println(f"[probe] ${"query"}%-24s ${"1x"}%8s ${s"${k}x"}%8s ratio")
    val rows = probes.map { q =>
      val t1 = time(base, q)
      val t10 = time(out, q)
      println(f"[probe] $q%-24s $t1%8.2f $t10%8.2f ${t10 / t1}%5.1f")
      (q, t1, t10)
    }
    val (s1, s10) = (rows.map(_._2).sum, rows.map(_._3).sum)
    println(f"[probe] ${"TOTAL"}%-24s $s1%8.2f $s10%8.2f ${s10 / s1}%5.1f")
    spark.stop()
  }
}
