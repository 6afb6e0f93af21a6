package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("exact dedup flags constructed duplicates, keeps first id") {
    import spark.implicits._
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ===
      Seq((1L, false), (2L, false), (3L, true), (4L, true)))
  }

  test("minhash LSH finds planted near-dup pairs with high jaccard") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // near-dups planted by the generator (confirmed by exact char-level
    // jaccard >= 0.95 across three independent methods)
    for (p <- Seq((0L, 50L), (0L, 82L), (5L, 450L))) {
      assert(pairs.contains(p), s"missing planted pair $p")
      assert(pairs(p) > 0.8)
    }
    assert(pairs.values.forall(_ >= 0.5))
  }

  test("simhash pairs are within the hamming bound and cover planted dups") {
    val got = Dedup.simhashPairs(docs, "text", "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got.values.forall(_ <= 3))
    assert(got.contains((0L, 50L)) && got.contains((5L, 450L)))
  }

  test("simhash 128-bit: pigeonhole-exact at Hamming <= 7, banded = brute") {
    // exactness, not just coverage: the 8 x 16-bit banding must return
    // EXACTLY the brute-force within-radius pair set — a missed pair
    // would falsify the pigeonhole guarantee the wider kernel exists
    // for (the 64-bit path can only promise radius 3)
    val sigs = docs.select(col("doc_id"),
        org.apache.spark.sql.graft.Bridge.column(graft.plans.SimHash128(
          org.apache.spark.sql.graft.Bridge.expression(
            graft.functions.TextFunctions.tokens(col("text"))))).as("s"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa(0) ^ sb(0)) +
        java.lang.Long.bitCount(sa(1) ^ sb(1))
      if h <= 7
    } yield ((ia, ib), h)).toMap
    val banded = Dedup.simhashPairs(docs, "text", "doc_id",
        maxHamming = 7, bits = 128)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(banded === brute)
    assert(brute.nonEmpty, "radius-7 pair set empty — corpus lost its planted dups")
    // like-for-like operating point: expected Hamming distance DOUBLES
    // with bits (each 64-bit vote family contributes its own flips), so
    // radius 7 on 128 bits plays the role radius 3 plays on 64 — as a
    // STATISTIC, not per pair (an individual near-dup can draw a large
    // second-family distance; (0,50) does, deterministically, on this
    // corpus). The wider kernel must recover the bulk of the 64-bit
    // radius-3 set, including a named planted dup
    val h64 = Dedup.simhashPairs(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recovered = h64.count(banded.keySet)
    assert(recovered * 2 >= h64.size,
      s"128-bit radius-7 recovered $recovered of ${h64.size} 64-bit pairs")
    assert(banded.contains((5L, 450L)))
    val r3 = Dedup.simhashPairs(docs, "text", "doc_id",
        maxHamming = 3, bits = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r3.subsetOf(banded.keySet), "tighter radius produced a non-subset")
    // the guarantee boundary is enforced, not silently degraded
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 8, bits = 128)
    }
    assert(e.getMessage.contains("pigeonhole"))
    val e64 = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 4)
    }
    assert(e64.getMessage.contains("pigeonhole"))
  }

  test("ngram jaccard pairs respect the threshold and ordering") {
    val got = Dedup.ngramJaccardPairs(docs, "text", "doc_id").collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getLong(0) < r.getLong(1)))
    assert(got.forall(r => r.getDouble(2) >= 0.7))
  }

  test("clusters: transitive closure with minimum-id canonical") {
    import spark.implicits._
    // components: {1,2,3,4} via a chain, {10,11}, pair order mixed
    val pairs = Seq((2L, 3L, 0.9), (1L, 2L, 0.9), (3L, 4L, 0.9), (11L, 10L, 0.9))
      .toDF("id_a", "id_b", "jaccard")
    val got = operators.Dedup.clusters(pairs).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq === Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (10L, 10L, true), (11L, 10L, false)))
  }

  test("clusters: a 50-hop chain resolves without a diameter dependence") {
    import spark.implicits._
    // the r9 weak mark: min-label propagation needed diameter rounds and
    // silently returned partial labels past maxIter=20. The alternating
    // large-star/small-star rewrite converges in O(log^2 n) rounds, so a
    // chain far beyond the old cap resolves to ONE cluster rooted at 0 —
    // under the default maxIter, no tuning.
    val pairs = (0L until 50L).map(i => (i, i + 1, 0.9))
      .toDF("id_a", "id_b", "jaccard")
    val got = Dedup.clusters(pairs).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length === 51)
    assert(got.forall(_._2 === 0L), "all 51 chained ids share cluster 0")
    assert(got.count(_._3) === 1 && got.head === ((0L, 0L, true)))
  }

  test("clusters: hitting the iteration cap fails loudly, never partial labels") {
    import spark.implicits._
    // maxIter=1 cannot finish any multi-edge component; the call must
    // throw, not return mislabeled keepers
    val pairs = (0L until 40L).map(i => (i, i + 1, 0.9))
      .toDF("id_a", "id_b", "jaccard")
    val e = intercept[IllegalArgumentException] {
      Dedup.clusters(pairs, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("clusters: universe emits unpaired ids as their own canonical cluster") {
    import spark.implicits._
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9)).toDF("id_a", "id_b", "jaccard")
    val universe = Seq(1L, 2L, 3L, 7L, 9L).toDF("doc_id")
    val got = Dedup.clusters(pairs, universe = Some(universe))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq === Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (7L, 7L, true), (9L, 9L, true)))
    // keep-one-per-cluster in one call: canonicals = one per cluster +
    // every singleton
    val keep = Dedup.clusters(pairs, universe = Some(universe))
      .filter(col("is_canonical")).count()
    assert(keep === 3L)
  }

  test("clusters rides reliable checkpoints when the session has a checkpoint dir") {
    import spark.implicits._
    // NOTE: this test mutates the SESSION-GLOBAL checkpoint dir, which
    // flips Dedup.clusters' auto mode to reliable for anything running
    // concurrently in this JVM. Safe because sbt forked tests execute
    // suites sequentially (Test/fork := true with the default
    // testForkedParallel = false); revisit if that ever changes.
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty)
    // without a checkpoint dir, forcing the reliable path must fail fast
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (10L, 11L, 0.9))
      .toDF("id_a", "id_b", "jaccard")
    intercept[IllegalArgumentException] {
      Dedup.clusters(pairs, reliableCheckpoint = Some(true))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    sc.setCheckpointDir(dir)
    try {
      // with a dir configured, auto mode goes reliable: same answer, and
      // checkpoint data lands under the configured dir (cluster-survivable)
      val got = Dedup.clusters(pairs).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(got.toSeq === Seq(
        (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
        (10L, 10L, true), (11L, 10L, false)))
      def rddFiles(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles.map(rddFiles).sum
        else if (f.getName.startsWith("part-")) 1L else 0L
      assert(rddFiles(new java.io.File(dir)) > 0,
        s"expected reliable checkpoint files under $dir")
    } finally {
      // unset (Option(null) => None inside setCheckpointDir) so the
      // shared test session doesn't leak reliable mode into every later
      // clusters call in this JVM — and remove the temp checkpoint data
      sc.setCheckpointDir(null)
      assert(sc.getCheckpointDir.isEmpty)
      deleteRecursively(new java.io.File(dir))
    }
  }

  test("asOf join carries the latest at-or-before row per key") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (2L, 100L, 25L), (3L, 200L, 10L), (4L, 100L, 5L))
      .toDF("lid", "k", "t")
    val right = Seq((100L, 10L, "a"), (100L, 20L, "b"), (300L, 5L, "z"))
      .toDF("k", "t", "v")
    val got = operators.AsOfJoin.asOf(left, right, "k", "k", "t", "t", Seq("v"))
      .select("lid", "asof_v").orderBy("lid").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    // lid=1: t=10 matches right t=10 (inclusive); lid=2: t=25 -> "b";
    // lid=3: other key, no rows; lid=4: t=5 before all -> null
    assert(got.toSeq === Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, None)))
  }

  test("embedding LSH bucket width scales with corpus size (linear candidates)") {
    // occupancy ~64 held across scales: n/2^bits stays bounded, so the
    // bucket self-join's candidate volume grows linearly, not n^2/2^fixed
    assert(Dedup.autoBits(0) === 6)
    assert(Dedup.autoBits(500) === 6)     // floor: never coarser than 64 buckets
    assert(Dedup.autoBits(5000) === 7)    // sf0.1-sized corpus
    assert(Dedup.autoBits(50000) === 10)  // 10x replica
    assert(Dedup.autoBits(5000000) === 16) // ceil(log2(5e6/64))=17, capped
    assert(Dedup.autoBits(Long.MaxValue) === 16) // cap: recall floor wins
    // occupancy bound holds wherever the cap isn't active
    for (n <- Seq(5000L, 50000L, 500000L))
      assert(n.toDouble / (1L << Dedup.autoBits(n)) <= 64.0 + 1e-9)
  }

  test("embedding LSH pairs are cosine-verified above threshold") {
    val emb = Tables.load(spark, sf, "embeddings")
    val got = Dedup.embeddingPairs(emb, "embedding", "vec_id").collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getDouble(2) >= 0.35))
    assert(got.forall(r => r.getLong(0) < r.getLong(1)))
    // no duplicate pairs across LSH tables
    val keys = got.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length)
  }

  test("semantic pairs: k=1 degenerates to exact all-pairs (one cluster)") {
    val emb = Tables.load(spark, sf, "embeddings")
    val brute = Dedup.bruteEmbeddingPairs(emb, "embedding", "vec_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val one = Dedup.semanticPairs(emb, "embedding", "vec_id", k = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(one === brute) // same pair set, same exact cosines
  }

  test("semantic pairs: cluster blocking keeps precision 1.0, bounded recall loss") {
    val emb = Tables.load(spark, sf, "embeddings")
    val brute = Dedup.bruteEmbeddingPairs(emb, "embedding", "vec_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val got = Dedup.semanticPairs(emb, "embedding", "vec_id", k = 16).collect()
    assert(got.nonEmpty)
    // precision 1.0 by construction: every pair is a true pair with its
    // EXACT brute-force cosine (blocking only decides who gets compared)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getDouble(3) >= 0.35 && key._1 < key._2)
      assert(brute.get(key).contains(r.getDouble(3)), s"not a brute pair: $key")
    }
    // unrefined id-prefix seeds still recover a usable share; coarser
    // blocking (fewer clusters) can only add pairs
    val recall16 = got.length.toDouble / brute.size
    assert(recall16 >= 0.15, s"blocking recall collapsed: $recall16")
    val n4 = Dedup.semanticPairs(emb, "embedding", "vec_id", k = 4).collect().length
    assert(n4 >= got.length, s"k=4 found $n4 < k=16's ${got.length}")
    // supplied centroids (the refined-quantizer path) keep the same
    // precision contract
    val custom = emb.orderBy(col("vec_id").desc).limit(8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("sv"))
    val viaCustom = Dedup.semanticPairs(emb, "embedding", "vec_id",
      centroids = Some(custom)).collect()
    viaCustom.foreach { r =>
      assert(brute.get((r.getLong(0), r.getLong(1))).contains(r.getDouble(3)))
    }
  }

  test("semantic pairs: multi-probe blocking is monotone in recall, precision intact") {
    val emb = Tables.load(spark, sf, "embeddings")
    val brute = Dedup.bruteEmbeddingPairs(emb, "embedding", "vec_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val cents = emb.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id").as("seed_id"), col("embedding").as("sv"))
    def pairs(p: Int): Map[(Long, Long), Double] =
      Dedup.semanticPairs(emb, "embedding", "vec_id",
        centroids = Some(cents), probes = p)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val p1 = pairs(1); val p2 = pairs(2); val p3 = pairs(3)
    // each extra probe can only ADD shared clusters: pair-set chain
    assert(p1.keySet.subsetOf(p2.keySet), "probes=2 lost a probes=1 pair")
    assert(p2.keySet.subsetOf(p3.keySet), "probes=3 lost a probes=2 pair")
    assert(p3.size > p1.size, "extra probes recovered no boundary pair")
    // precision stays structural on every path: exact verified cosines
    for (m <- Seq(p1, p2, p3); (k, cos) <- m)
      assert(brute.get(k).contains(cos), s"not a brute pair: $k")
    // probes >= nlist degenerates to every pair sharing a cluster —
    // i.e. exact all-pairs, same as the k=1 degeneracy
    assert(pairs(16).keySet === brute.keySet)
    // a tie-broken argmax pair found by single-assignment keeps its
    // cluster provenance; multi-probe may relabel to the smallest
    // SHARED probed cluster, so cluster_id is provenance, not identity
    require(probesRejected(emb, cents))
  }

  private def probesRejected(emb: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame): Boolean = {
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticPairs(emb, "embedding", "vec_id",
        centroids = Some(cents), probes = 0)
    }
    e.getMessage.contains("probes")
  }

  test("minhash blocking auto-steepens its S-curve with corpus size") {
    // same structural term as ngram (bands * J_bg^rows * n^2/2), lower
    // word-shingle background constant — legacy 64/16 recovered at
    // test sizes, steeper shapes past ~126k docs
    assert(Dedup.autoMinhashRows(0) === 4)
    assert(Dedup.autoMinhashRows(5000) === 4)
    assert(Dedup.autoMinhashRows(126000) === 4)
    assert(Dedup.autoMinhashRows(130000) === 5)
    assert(Dedup.autoMinhashRows(100000000L) === 8)
    assert(Dedup.autoMinhashRows(Long.MaxValue) === 12)
    for (n <- Seq(500000L, 50000000L))
      assert(n * math.pow(0.15, Dedup.autoMinhashRows(n)) <= 64.0 + 1e-9)
    for (r <- 4 to 12) {
      val b = Dedup.autoMinhashBands(r)
      val recall = 1 - math.pow(1 - math.pow(0.8, r), b)
      assert(recall >= 0.999, s"rows=$r bands=$b recall=$recall")
    }
    assert(Dedup.autoMinhashBands(4) === 16) // the legacy shape, recovered
    val docs = Tables.load(spark, sf, "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val auto = pairs(Dedup.minhashPairs(docs, "text", "doc_id"))
    val pinned = pairs(Dedup.minhashPairs(docs, "text", "doc_id",
      numHashes = 64, bands = 16))
    val hinted = pairs(Dedup.minhashPairs(docs, "text", "doc_id",
      rowHint = docs.count()))
    assert(auto === pinned)
    assert(hinted === auto)
    assert(auto.nonEmpty)
    // half-pinned shapes are rejected, not silently mis-sized
    intercept[IllegalArgumentException] {
      Dedup.minhashPairs(docs, "text", "doc_id", numHashes = 64)
    }
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", bands = 12)
    }
    // swapped pins (rows = 16/64 = 0 would fold ZERO minima into every
    // band key: one bucket per band, the full n^2 cross product) and
    // non-divisible pins (silently a different shape) are rejected too
    intercept[IllegalArgumentException] {
      Dedup.minhashPairs(docs, "text", "doc_id", numHashes = 16, bands = 64)
    }
    intercept[IllegalArgumentException] {
      Dedup.minhashPairs(docs, "text", "doc_id", numHashes = 64, bands = 10)
    }
  }

  test("ngram blocking auto-steepens its S-curve with corpus size") {
    // fixed (bands, rows) leaves a background-collision candidate term
    // bands * J_bg^rows * n^2/2 — quadratic (the 100x probe filled the
    // disk on it); auto rows hold n * J_bg^rows <= ~64 per band
    assert(Dedup.autoNgramRows(0) === 6)
    assert(Dedup.autoNgramRows(500) === 6)
    assert(Dedup.autoNgramRows(5000) === 6)
    assert(Dedup.autoNgramRows(50000) === 7)
    assert(Dedup.autoNgramRows(500000) === 9)
    assert(Dedup.autoNgramRows(Long.MaxValue) === 16)
    for (n <- Seq(50000L, 500000L, 50000000L))
      assert(n * math.pow(0.35, Dedup.autoNgramRows(n)) <= 64.0 + 1e-9,
        s"occupancy bound broken at n=$n")
    // steeper rows would silently cut recall — bands must restore
    // >= 0.999 at the J=0.9 near-dup design point
    for (r <- 6 to 16) {
      val b = Dedup.autoNgramBands(r)
      val recall = 1 - math.pow(1 - math.pow(0.9, r), b)
      assert(recall >= 0.999, s"rows=$r bands=$b recall=$recall")
    }
    assert(Dedup.autoNgramBands(6) === 12) // the legacy shape, recovered
    // at test-corpus size AUTO resolves to exactly the legacy 12x6, so
    // the default path IS the oracled d_dedup_ngram shape; a correct
    // rowHint reproduces it without the sizing count
    val docs = Tables.load(spark, sf, "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val auto = pairs(Dedup.ngramJaccardPairs(docs, "text", "doc_id"))
    val pinned = pairs(Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      bands = 12, rows = 6))
    val hinted = pairs(Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      rowHint = docs.count()))
    assert(auto === pinned)
    assert(hinted === auto)
    assert(auto.nonEmpty)
    // the registered key's job-free hint: the parquet-footer row count
    // is exactly the corpus count (so hinted-AUTO == counted-AUTO)
    assert(graft.Tables.metadataRowCount(spark, sf, "documents")
      === docs.count())
  }

  test("steeper AUTO shapes execute end-to-end and keep the high-J pairs") {
    // local corpora are small, so AUTO normally resolves to the legacy
    // shapes — force the large-corpus sizing with an oversized rowHint
    // so the steep path (more rows, re-solved bands) actually RUNS:
    // precision stays exact (every returned pair is brute-verified in
    // the legacy set, which the d_dedup_* oracles prove complete) and
    // the near-saturated pairs survive (per-pair miss ~1e-6 at J>=0.95)
    val docs = Tables.load(spark, sf, "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // ngram: hint 200k docs -> rows 8, bands 13 (vs legacy 12x6)
    assert(Dedup.autoNgramRows(200000) === 8)
    val ngLegacy = pairs(Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      bands = 12, rows = 6))
    val ngSteep = pairs(Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      rowHint = 200000L))
    assert(ngSteep.nonEmpty)
    ngSteep.foreach { case (k, v) =>
      assert(ngLegacy.get(k).contains(v), s"steep emitted a non-brute pair $k")
    }
    val ngHigh = ngLegacy.filter(_._2 >= 0.95).keySet
    assert(ngHigh.subsetOf(ngSteep.keySet),
      s"steep ngram lost near-saturated pairs: ${ngHigh -- ngSteep.keySet}")
    // minhash: hint 10M docs -> rows 7, bands 30 (vs legacy 16x4)
    assert(Dedup.autoMinhashRows(10000000L) === 7)
    val mhLegacy = pairs(Dedup.minhashPairs(docs, "text", "doc_id",
      numHashes = 64, bands = 16))
    val mhSteep = pairs(Dedup.minhashPairs(docs, "text", "doc_id",
      rowHint = 10000000L))
    assert(mhSteep.nonEmpty)
    mhSteep.foreach { case (k, v) =>
      assert(mhLegacy.get(k).contains(v), s"steep emitted a non-brute pair $k")
    }
    val mhHigh = mhLegacy.filter(_._2 >= 0.95).keySet
    assert(mhHigh.subsetOf(mhSteep.keySet),
      s"steep minhash lost near-saturated pairs: ${mhHigh -- mhSteep.keySet}")
  }

  test("semantic pairs: default k auto-sizes occupancy-held (autoK wiring)") {
    // sqrt-sizing via Similarity.autoNlist: mean cluster occupancy and
    // within-cluster comparison count both ~sqrt(n) — a fixed default
    // was O(n^2/k) pair volume shuffled onto k hot partitions
    assert(Dedup.autoK(0) === 16)
    assert(Dedup.autoK(256) === 16)
    assert(Dedup.autoK(5000) === 71)
    assert(Dedup.autoK(1000000) === 1000)
    assert(Dedup.autoK(Long.MaxValue) === 4096)
    val emb = Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val auto = Dedup.semanticPairs(emb, "embedding", "vec_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toSeq.sorted
    val pinned = Dedup.semanticPairs(emb, "embedding", "vec_id", k = Dedup.autoK(n))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toSeq.sorted
    assert(auto === pinned, "default path must equal explicit k = autoK(count)")
    assert(auto.nonEmpty)
    // rowHint parity: a correct hint reproduces AUTO exactly
    val hinted = Dedup.semanticPairs(emb, "embedding", "vec_id", rowHint = n)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toSeq.sorted
    assert(hinted === auto)
  }

  test("containment flags an excerpt inside its source; Jaccard-symmetric ops cannot") {
    import spark.implicits._
    // 50-word source, 10-word excerpt: containment(excerpt→source) = 1.0
    // while Jaccard ≈ 10/50 = 0.2 — far below every near-dup threshold.
    val words = (0 until 50).map(i => s"w$i")
    val src = words.mkString(" ")
    val exc = words.slice(20, 30).mkString(" ")
    val other = (0 until 50).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, src), (2L, exc), (3L, other)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "text", "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    // directional: the excerpt flags against its source...
    assert(got.get((2L, 1L)).exists(_ >= 80L),
      s"excerpt must flag against source, got $got")
    // ...never the reverse (the source's shingles are mostly NOT in the
    // excerpt), and the unrelated doc flags against nothing
    assert(!got.contains((1L, 2L)))
    assert(!got.keys.exists(k => k._1 == 3L || k._2 == 3L))
    // exact arithmetic: the excerpt has 8 distinct 3-token shingles, all
    // present in the source → n_inter = sz_a = 8, contain_pct = 100
    assert(got((2L, 1L)) === 100L)
  }

  test("containment df-cap drops boilerplate shingles from BOTH sides of the ratio") {
    import spark.implicits._
    // a shingle shared by many docs (over the cap) must not key the join
    // NOR count toward any document's size — ratio stays consistent
    val boiler = "common header line"
    val docs = (1L to 25L).map(i => (i, s"$boiler body$i unique$i tail$i"))
    val df = (docs :+ (99L, boiler)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "text", "doc_id", maxDf = 20L)
    // the boiler shingle appears in 26 docs > cap 20; each doc's other
    // shingles are unique → zero candidate pairs survive
    assert(got.count() === 0L)
  }

  test("cdc chunks partition every document exactly (lengths sum, idx dense)") {
    val byDoc = Dedup.cdcChunks(docs, "text", "doc_id")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n"), sum(col("chunk_len")).as("len"),
        min(col("idx")).as("lo"), max(col("idx")).as("hi"))
      .join(docs.select(col("doc_id").as("id"), length(col("text")).as("want")), "id")
      .collect()
    assert(byDoc.length === docs.filter(length(col("text")) > 0).count())
    byDoc.foreach { r =>
      assert(r.getAs[Long]("len") === r.getAs[Int]("want").toLong,
        s"chunk lengths must sum to the document length (doc ${r.getAs[Long]("id")})")
      assert(r.getAs[Long]("lo") === 1L &&
        r.getAs[Long]("hi") === r.getAs[Long]("n"), "idx must be dense from 1")
    }
  }

  test("cdc boundaries are content-defined: a prefix insertion realigns within one chunk") {
    import spark.implicits._
    // a real document's text, then the same text behind a 6-char
    // insertion: every cut whose 3-char window sits inside the shared
    // content survives the shift (the window sees the same bytes), so
    // only the head chunk — up to the first shared cut — may differ.
    // This is exactly the property fixed-width blocking lacks: there,
    // a 6-char shift re-keys EVERY downstream block.
    val textA = docs.orderBy(col("doc_id")).select(col("text"))
      .filter(length(col("text")) > 200).first().getString(0)
    val two = Seq((1L, textA), (2L, "xyzzy " + textA)).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(two, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val a = ch.filter(_._1 == 1L).map(_._2)
    val b = ch.filter(_._1 == 2L).map(_._2).toSet
    assert(a.length >= 3, s"need several chunks for the test to bite, got ${a.length}")
    val shared = a.count(b.contains)
    assert(shared >= a.length - 1,
      s"all but the head chunk must survive the shift: $shared of ${a.length}")
    // and the duplication is visible content: a doc that repeats a
    // block twice carries duplicate chunk hashes
    val rep = Seq((9L, textA + textA)).toDF("doc_id", "text")
    val hs = Dedup.cdcChunks(rep, "text", "doc_id")
      .groupBy(col("h")).agg(count(lit(1)).as("c")).collect()
    assert(hs.exists(_.getAs[Long]("c") >= 2L),
      "a doubled document must produce repeated chunk hashes")
  }
}
