package graft

import graft.operators.{Corpus, Multimodal, PngCodec}
import graft.plans.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Compression-signal and perceptual-hash properties (round-11
  * additions): DEFLATE kernel determinism and redundancy detection,
  * pHash scale-invariance and separation, and the oracled contract
  * rows' booleans. */
class CorpusSpec extends SparkSpec {

  private def dsize(s: String): Long =
    TextOps.deflateSize(UTF8String.fromString(s), 6)

  test("deflateSize: deterministic, bounded, detects redundancy") {
    val text = "the quick brown fox jumps over the lazy dog " * 8
    assert(dsize(text) == dsize(text)) // deterministic
    assert(dsize(text) > 0 && dsize(text) <= text.getBytes("UTF-8").length + 64)
    // doubling compresses to (far) less than twice
    assert(dsize(text + text) < 2 * dsize(text))
    // repetitive text compresses harder than varied text of equal length
    val rep = "ab" * 200
    val varied = (0 until 400).map(i => ('a' + (i * 131 + i * i * 7) % 26).toChar).mkString
    assert(rep.length == varied.length)
    assert(dsize(rep) < dsize(varied))
  }

  test("t_compress_contract: both corpus-wide booleans hold") {
    val r = Corpus.tCompressContract.fn(spark, sf).collect()(0)
    assert(r.getAs[Boolean]("bounds_ok") && r.getAs[Boolean]("doubling_ok"))
    assert(r.getAs[Long]("n_docs") > 0)
  }

  test("phash64: invariant under rescaling, separates distinct images") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val ids = Seq(0L, 5L, 10L, 15L, 77L)
    val hashes = ids.map { id =>
      val base = PngCodec.renderSmooth(id, 160, 120)
      val h0 = PngCodec.phash64(base)
      // every scaled re-render hashes within the pinned intra radius
      Seq(0.4, 0.55, 0.7, 0.85).foreach { sc =>
        val hs = PngCodec.phash64(PngCodec.resize(base, sc))
        assert(hamming(h0, hs) <= 8, s"id=$id scale=$sc drift=${hamming(h0, hs)}")
      }
      h0
    }
    // distinct base images stay separated beyond the pinned inter floor
    for (i <- hashes.indices; j <- hashes.indices if i < j)
      assert(hamming(hashes(i), hashes(j)) >= 12,
        s"ids ${ids(i)},${ids(j)} too close: ${hamming(hashes(i), hashes(j))}")
  }

  test("phash64 and renderSmooth are deterministic") {
    val a = PngCodec.phash64(PngCodec.renderSmooth(42L, 160, 120))
    val b = PngCodec.phash64(PngCodec.renderSmooth(42L, 160, 120))
    assert(a == b)
  }

  test("signature store: shape survives parquet, stored delta ≡ recompute, bare store rejected") {
    import graft.operators.Dedup
    val docs = Tables.load(spark, sf, "documents")
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val inc = docs.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_sigstore_spec")
    try {
      Dedup.signatureStore(ref, "text", "doc_id", numHashes = 64, bands = 16)
        .write.mode("overwrite").parquet(dir.toString)
      val store = spark.read.parquet(dir.toString)
      // shape metadata survived the parquet round-trip
      val meta = store.schema.find(_.name == "bkeys").get.metadata
      assert(meta.getString("graft.sigstore.shape") == "3,16,4,42")
      val stored = Dedup.crossCorpusPairsStored(inc, store, "text", "doc_id")
      val fresh = Dedup.crossCorpusPairs(inc, ref, "text", "doc_id",
        numHashes = 64, bands = 16)
      assert(stored.exceptAll(fresh).isEmpty && fresh.exceptAll(stored).isEmpty)
      // a store without shape metadata is rejected loudly, not probed
      val bare = store.select(col("ref_id"), col("sh"),
        col("bkeys").as("bkeys",
          org.apache.spark.sql.types.Metadata.empty)) // strip field metadata
      val e = intercept[IllegalArgumentException] {
        Dedup.crossCorpusPairsStored(inc, bare, "text", "doc_id")
      }
      assert(e.getMessage.contains("banding-shape metadata"))
    } finally deleteRecursively(dir.toFile)
  }

  test("m_modal_phash: one hash per doc, groups of ≤5, contract green") {
    val out = Corpus.mModalPhash.fn(spark, sf).cache()
    val docs = Tables.load(spark, sf, "documents")
    assert(out.count() == docs.count())
    val per = out.groupBy("group_id").agg(count(lit(1)).as("n"))
    assert(per.filter(col("n") > 5).isEmpty)
    val c = Corpus.mModalPhashContract.fn(spark, sf).collect()(0)
    assert(c.getAs[Boolean]("intra_ok") && c.getAs[Boolean]("inter_ok"))
  }

  test("t_freq_sketch: CMS bounds hold and the top-20 is the exact top-20") {
    val out = Corpus.tFreqSketch.fn(spark, sf).collect()
    assert(out.length === 20)
    assert(out.forall(_.getAs[Boolean]("one_sided_ok")))
    assert(out.forall(_.getAs[Boolean]("bound_ok")))
    val counts = out.map(_.getAs[Long]("n_exact"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("d_dedup_cascade: ledger telescopes and stages only shrink") {
    val rows = Corpus.dDedupCascade.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.map(_._1) === Seq("1_input", "2_exact", "3_near_dup"))
    val Seq(in, ex, nd) = rows
    assert(in._3 === 0L)
    assert(ex._2 + ex._3 === in._2) // exact drops telescope from input
    assert(nd._2 + nd._3 === ex._2) // near-dup drops telescope from exact
    assert(nd._2 > 0)
  }

  test("d_corpus_diff: statuses partition both snapshots") {
    val byStatus = Corpus.dCorpusDiff.fn(spark, sf).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val n = Tables.load(spark, sf, "documents").count()
    // v1 = removed + changed + unchanged; v2 = added + changed + unchanged
    assert(byStatus.getOrElse("removed", 0L) + byStatus.getOrElse("changed", 0L)
      + byStatus.getOrElse("unchanged", 0L) === n)
    assert(byStatus.getOrElse("added", 0L) > 0)
  }

  test("q_zonemap: z-order prunes 2-D predicates, natural order cannot; pruning is sound") {
    val out = Corpus.qZonemap.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    val (nBlocks, nScanned, nPpm) = out("natural")
    val (zBlocks, zScanned, zPpm) = out("zorder")
    // arrival-order blocks span the full key ranges: zero pruning
    assert(nPpm === 1000000L && nScanned === nBlocks * 16)
    // the layout job buys real pruning
    assert(zPpm < 600000L, s"z-order must prune: $zPpm ppm")
    assert(zScanned < zBlocks * 16)
    // SOUNDNESS: a pruned block contains no matching row — replay one
    // predicate (first quartile of both keys) against the raw rows
    val li = Tables.load(spark, sf, "lineitem")
    val st = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).collect()(0)
    val (pkMin, pkMax, skMin, skMax) =
      (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    val (phi, shi) = (pkMin + (pkMax - pkMin + 1) / 4 - 1,
      skMin + (skMax - skMin + 1) / 4 - 1)
    val zCol = (0 until 28).flatMap { i =>
      Seq(s"shiftleft(shiftright(l_partkey, $i) & 1, ${2 * i})",
        s"shiftleft(shiftright(l_suppkey, $i) & 1, ${2 * i + 1})")
    }.mkString("(", " + ", ")")
    val z = li.select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
      expr(zCol).as("z"))
    val zmax = z.agg(max(col("z"))).collect()(0).getLong(0)
    val blockOf = z.withColumn("blk", expr(s"(z * 64) div (${zmax}L + 1)"))
    val matchBlocks = blockOf
      .filter(col("pk") <= phi && col("sk") <= shi)
      .select(col("blk")).distinct().collect().map(_.getLong(0)).toSet
    val scannedBlocks = blockOf.groupBy(col("blk"))
      .agg(min(col("pk")).as("bpkmin"), min(col("sk")).as("bskmin"))
      .filter(col("bpkmin") <= phi && col("bskmin") <= shi)
      .select(col("blk")).collect().map(_.getLong(0)).toSet
    assert(matchBlocks.subsetOf(scannedBlocks),
      s"pruning dropped blocks with matches: ${matchBlocks -- scannedBlocks}")
  }
}
