package graft.operators

import graft.{QueryDef, Tables}
import graft.plans.DeflateSize
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Corpus-management operators: the bookkeeping a 100 TB curation
  * pipeline runs AROUND its dedup/selection kernels — per-domain
  * caps, incremental (delta) dedup of a new batch against the
  * accumulated corpus, and the dedup report that tells the operator
  * what a run actually dropped.
  */
object Corpus {

  /** Per-domain document cap (CCNet/RefinedWeb-style): keep at most
    * `cap` documents per source, priority = longest first (ties by
    * doc_id). The anti-spam guard against one domain flooding the
    * corpus.
    *
    * Ranks via the shared hot-partition-safe two-phase top-k
    * ([[Ranking.topKPerGroup]] — domains are few and hot, so a single
    * window partitioned by source would funnel an entire domain,
    * corpus/#domains rows, into one partition). */
  val tDomainCap: QueryDef = QueryDef(
    fn = (s, dir) =>
      Ranking.topKPerGroup(
          Tables.load(s, dir, "documents")
            .select(col("doc_id"), col("source"), col("n_chars")),
          Seq(col("source")), Seq(col("n_chars").desc, col("doc_id")),
          12, "rnk")
        .select(col("doc_id"), col("source"), col("n_chars"), col("rnk"))
        .orderBy(col("doc_id")),
    oracle = Some("""
      SELECT doc_id, source, n_chars, rnk
      FROM (SELECT doc_id, source, n_chars,
              CAST(row_number() OVER (PARTITION BY source
                ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk
            FROM documents)
      WHERE rnk <= 12
      ORDER BY doc_id"""))

  /** Incremental dedup driver row: odd doc_ids play the incoming
    * batch, even doc_ids the accumulated reference corpus; every
    * incoming document near-dup of a reference document comes back
    * (doc_id, ref_id, jaccard). The oracle recomputes the full brute
    * shingle-Jaccard pair list and keeps the odd→even slice, so the
    * cross-corpus banding must reach 100% recall on this corpus for
    * the hash to match — recall proven, not assumed. Shape pinned to
    * the 64/16 the AUTO path resolves to at these reference sizes
    * (repo contract-query convention). */
  val dDedupDelta: QueryDef = QueryDef(
    fn = (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.crossCorpusPairs(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", numHashes = 64, bands = 16)
        .orderBy(col("doc_id"), col("ref_id"))
    },
    oracle = Some(s"""
      WITH ${Pipeline.shinglePairsSql}
      SELECT doc_id, ref_id, jaccard FROM (
        SELECT id_a AS doc_id, id_b AS ref_id, jaccard FROM jpairs
        WHERE id_a % 2 = 1 AND id_b % 2 = 0
        UNION ALL
        SELECT id_b AS doc_id, id_a AS ref_id, jaccard FROM jpairs
        WHERE id_b % 2 = 1 AND id_a % 2 = 0)
      ORDER BY doc_id, ref_id"""))

  // One signature store per (session, sf dir): built from the even
  // (reference) half, written to parquet and read BACK so the delta
  // path exercises the real store lifecycle — shape metadata surviving
  // the parquet round-trip included. Keyed by session so a stopped
  // session's plans are never handed to a new one.
  private val storeCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]

  private def sigStore(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    storeCache.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    storeCache.getOrElseUpdate((s, dir), {
      // path carries a hash of the FULL dir (the cache key), not just
      // its basename: two corpora named sf0.1 under different parents
      // must not clobber each other's store on shared /tmp
      val dirTag = java.lang.Integer.toHexString(
        java.util.Arrays.hashCode(dir.getBytes("UTF-8")))
      val path = s"${sys.props("java.io.tmpdir")}/graft_sigstore_" +
        s"${new java.io.File(dir).getName}_$dirTag"
      Dedup.signatureStore(
        Tables.load(s, dir, "documents").filter(col("doc_id") % 2 === 0),
        "text", "doc_id", numHashes = 64, bands = 16)
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
    })
  }

  /** [[dDedupDelta]] through the PERSISTED path: the reference half's
    * signatures are materialized once ([[Dedup.signatureStore]] →
    * parquet → read back), and the incoming half probes the store at
    * the shape carried in its column metadata. Same oracle as
    * d_dedup_delta — the store lifecycle (write, read, metadata
    * round-trip, banded probe) must be RESULT-IDENTICAL to the
    * recompute-everything path, which is exactly what an incremental
    * 100 TB dedup needs to trust. */
  val dDedupDeltaStored: QueryDef = QueryDef(
    fn = (s, dir) =>
      Dedup.crossCorpusPairsStored(
        Tables.load(s, dir, "documents").filter(col("doc_id") % 2 === 1),
        sigStore(s, dir), "text", "doc_id")
        .orderBy(col("doc_id"), col("ref_id")),
    oracle = Some(s"""
      WITH ${Pipeline.shinglePairsSql}
      SELECT doc_id, ref_id, jaccard FROM (
        SELECT id_a AS doc_id, id_b AS ref_id, jaccard FROM jpairs
        WHERE id_a % 2 = 1 AND id_b % 2 = 0
        UNION ALL
        SELECT id_b AS doc_id, id_a AS ref_id, jaccard FROM jpairs
        WHERE id_b % 2 = 1 AND id_a % 2 = 0)
      ORDER BY doc_id, ref_id"""))

  /** The STREAMING ingest leg of the signature-store story,
    * driver-checked on its batch equivalent: decode the documents
    * topic, keep the odd half as the incoming stream, probe the even
    * half's persisted store ([[sigStore]]) via
    * [[graft.streaming.Streaming.nearDupAgainstStore]] — the
    * steady-state topology where a nightly job appends signatures and
    * the ingest stream never touches reference text. StreamingSpec
    * replays the same path micro-batched; the oracle is the same
    * brute cross-side Jaccard as d_dedup_delta, so store probing from
    * the stream must lose nothing the recompute path finds. */
  val sDeltaDedup: QueryDef = QueryDef(
    fn = (s, dir) => {
      import graft.streaming.Streaming
      val docs = Streaming.decodeDocuments(
        graft.sources.MessageLog.documentsTopic(s, dir))
      Streaming.nearDupAgainstStore(
        docs.filter(col("doc_id") % 2 === 1), sigStore(s, dir))
        .orderBy(col("doc_id"), col("ref_id"))
    },
    oracle = Some(s"""
      WITH ${Pipeline.shinglePairsSql}
      SELECT doc_id, ref_id, jaccard FROM (
        SELECT id_a AS doc_id, id_b AS ref_id, jaccard FROM jpairs
        WHERE id_a % 2 = 1 AND id_b % 2 = 0
        UNION ALL
        SELECT id_b AS doc_id, id_a AS ref_id, jaccard FROM jpairs
        WHERE id_b % 2 = 1 AND id_a % 2 = 0)
      ORDER BY doc_id, ref_id"""))

  /** Dedup run report: cluster-size histogram over the FULL corpus
    * (near-dup components + singletons via the `universe` leg) —
    * (cluster_size, n_clusters, n_docs, n_dropped) where n_dropped
    * counts the non-canonical members a keep-one-per-cluster dedup
    * would drop. The summary an operator reads after every dedup run;
    * folding it from the label table is two bounded aggregations
    * (cluster_id, then size), never a re-shuffle of the corpus text.
    * Oracle: recursive transitive closure + NOT IN singleton leg,
    * aggregated the same way. */
  val dDedupReport: QueryDef = QueryDef(
    fn = (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val labels = Dedup.clusters(
        Dedup.minhashPairs(docs, "text", "doc_id",
          numHashes = 64, bands = 16),
        universe = Some(docs.select(col("doc_id"))))
      labels.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("cluster_size")).as("n_docs"),
          sum(col("cluster_size") - 1).as("n_dropped"))
        .orderBy(col("cluster_size"))
    },
    oracle = Some(s"""
      WITH RECURSIVE ${Pipeline.shinglePairsSql},
      edges AS (SELECT id_a AS src, id_b AS dst FROM jpairs
                UNION SELECT id_b, id_a FROM jpairs),
      reach AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
      labels AS (
        SELECT src AS id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
        UNION ALL
        SELECT doc_id, doc_id FROM documents
        WHERE doc_id NOT IN (SELECT src FROM edges)),
      csizes AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        FROM labels GROUP BY 1)
      SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(cluster_size) AS BIGINT) AS n_docs,
             CAST(sum(cluster_size - 1) AS BIGINT) AS n_dropped
      FROM csizes GROUP BY cluster_size
      ORDER BY cluster_size"""))

  private def deflated(text: Column): Column =
    Bridge.column(DeflateSize(Bridge.expression(text), 6))

  /** Compression-ratio quality signal: DEFLATE'd size per document as
    * basis points of the input bytes — the gzip-compressibility
    * heuristic curation pipelines use to flag BOTH tails (templated
    * boilerplate compresses far below the corpus norm; binary junk and
    * mojibake barely compress). Pure map over the corpus — one
    * codegen'd [[graft.plans.DeflateSize]] kernel per row, no shuffle
    * at any scale. DEFLATE output bytes are not SQL-recomputable, so
    * the entry is rows-only; [[tCompressContract]] carries the oracled
    * assertions. */
  val tCompress: QueryDef = QueryDef(
    fn = (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          expr("octet_length(text)").cast("long").as("n_in"),
          deflated(col("text")).as("n_out"))
        .withColumn("ratio_bp",
          expr("(n_out * 10000) div greatest(n_in, 1)"))
        .orderBy(col("doc_id")),
    oracle = None)

  /** The oracled contract behind [[tCompress]]: (1) every DEFLATE
    * size is positive and bounded by input + 64 slack bytes (raw
    * deflate's worst-case stored-block overhead at these sizes), and
    * (2) doubling a document must compress to LESS than twice the
    * original — the second copy is one back-reference, which is
    * exactly the redundancy-detection property the quality signal
    * relies on. Both properties fold to corpus-wide booleans the
    * oracle pins TRUE. */
  val tCompressContract: QueryDef = QueryDef(
    fn = (s, dir) => {
      val sized = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          expr("octet_length(text)").cast("long").as("n_in"),
          deflated(col("text")).as("n_out"),
          deflated(concat(col("text"), col("text"))).as("n_out2"))
      sized.agg(count(lit(1)).as("n_docs"),
        min(col("n_out") > 0 && col("n_out") <= col("n_in") + 64)
          .as("bounds_ok"),
        min(when(col("n_in") >= 32, col("n_out2") < col("n_out") * 2)
          .otherwise(lit(true))).as("doubling_ok"))
    },
    oracle = Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             TRUE AS bounds_ok, TRUE AS doubling_ok
      FROM documents"""))

  /** Per-image 64-bit DCT perceptual hash over the near-dup camera
    * roll ([[Multimodal.phashMediaTable]] — groups of 5 docs sharing
    * one smooth base image at five scales): the image-dedup signal
    * byte hashing cannot produce (every member's PNG bytes differ).
    * Pure per-partition decode+hash, no shuffle. Hash bytes are not
    * SQL-recomputable → rows-only; [[mModalPhashContract]] is the
    * oracled quality gate. */
  val mModalPhash: QueryDef = QueryDef(
    fn = (s, dir) =>
      Multimodal.phashMedia(s, Multimodal.phashMediaTable(s, dir))
        .select(col("doc_id"), col("group_id"), col("width"), col("height"),
          col("phash"))
        .orderBy(col("doc_id")),
    oracle = None)

  /** The oracled pHash quality contract: every within-group Hamming
    * distance (same photo, different scale) must stay at or under
    * `intraMax`, and adjacent-group representative distances (different
    * photos) at or above `interMin` — a separation gap, not a point
    * estimate. The intra join is keyed by group_id (bounded fan-out
    * `groupSize`², linear in corpus); the inter leg compares each
    * group's representative to the NEXT group only (linear), so the
    * contract itself survives a 100x corpus. Measured at sf0.01/sf0.1
    * (tools/PhashProbe): intra max 6/6 (mean 0.8), inter-adjacent min
    * 24/16, full cross-group min 16/14 — pinned with headroom at
    * intra ≤ 8 / inter ≥ 12, inside the measured 8-bit gap. */
  val mModalPhashContract: QueryDef = QueryDef(
    fn = (s, dir) => {
      val h = Multimodal.phashMedia(s, Multimodal.phashMediaTable(s, dir))
        .select(col("doc_id"), col("group_id"), col("phash_bits"))
      val (intraD, interD) = Multimodal.phashDistances(h)
      val intra = intraD.agg(max(col("d")).as("intra_max"))
      val inter = interD.agg(min(col("d")).as("inter_min"))
      h.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("group_id")).as("n_groups"))
        .crossJoin(intra).crossJoin(inter)
        .select(col("n_docs"), col("n_groups"),
          (col("intra_max") <= 8).as("intra_ok"),
          (col("inter_min") >= 12).as("inter_ok"))
    },
    oracle = Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT doc_id - doc_id % 5) AS BIGINT) AS n_groups,
             TRUE AS intra_ok, TRUE AS inter_ok
      FROM documents"""))

  /** m_dedup_phash — perceptual-hash NEAR-DUP PAIRS over the media
    * corpus ([[Multimodal.phashPairs]]): banded Hamming-≤3 candidate
    * join (4×16-bit pigeonhole — exactly the brute r≤3 set, the
    * multi-index-hashing device), emitted as (id_a, id_b, hamming).
    * What byte-level dedup cannot catch: every group member's PNG
    * bytes differ (different scales), but their hashes chain together
    * at r≤3. pHash itself is not SQL-recomputable → rows-only;
    * [[mDedupPhashContract]] is the oracled gate. */
  val mDedupPhash: QueryDef = QueryDef(
    fn = (s, dir) =>
      Multimodal.phashPairs(
        Multimodal.phashMedia(s, Multimodal.phashMediaTable(s, dir)))
        .orderBy(col("id_a"), col("id_b")),
    oracle = None)

  /** The oracled contract behind [[mDedupPhash]]: connected components
    * over the banded pairs must reconstruct the generator's camera-roll
    * groups — NO component ever spans two groups (measured cross-group
    * Hamming min 16/14 ≫ 3, so a cross merge is impossible: pinned
    * strict), and ≥95% of 5-member groups collapse into ONE component
    * (adjacent scales hash within r≤3 and chain the group; the 0.4×
    * extreme can sit past r=3 from every sibling — measured whole-group
    * rate 98% at sf0.01, 97.6% at sf0.1, floor pinned at 95). Both as
    * booleans plus the doc/group counts the oracle rebuilds from id
    * arithmetic. Scale: the pair join is the banded candidate set
    * (bounded buckets), components are the alternating-star rounds —
    * no quadratic leg anywhere. */
  val mDedupPhashContract: QueryDef = QueryDef(
    fn = (s, dir) => {
      // persisted: the hash table feeds BOTH the banded pair join and
      // the label join, and the decode behind it (5k PNG reads at
      // sf0.1) must not run twice — nor once per CC round through the
      // pair lineage (clusters() checkpoints its input, but the two
      // consumers here would still each decode)
      val h = Multimodal.phashMedia(s, Multimodal.phashMediaTable(s, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = Multimodal.phashPairs(h)
      val comps = Dedup.clusters(pairs)
      val labeled = h.select(col("doc_id"), col("group_id"))
        .join(comps.select(col("id").as("doc_id"), col("cluster_id")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("group_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cl"))
      val crossMerge = labeled.groupBy(col("cl"))
        .agg(countDistinct(col("group_id")).as("ng"))
        .agg(max(col("ng")).as("mg"))
      val groupSplit = labeled.groupBy(col("group_id"))
        .agg(countDistinct(col("cl")).as("nc"))
        .agg(count(lit(1)).as("ng_all"),
          sum(when(col("nc") === 1, 1L).otherwise(0L)).as("ng_whole"))
      val out = labeled.agg(count(lit(1)).as("n_docs"),
          countDistinct(col("group_id")).as("n_groups"))
        .crossJoin(crossMerge).crossJoin(groupSplit)
        .select(col("n_docs"), col("n_groups"),
          (col("mg") === 1).as("no_cross_merge"),
          expr("(100 * ng_whole) div ng_all >= 95").as("whole_ok"))
        .localCheckpoint(eager = true)
      h.unpersist()
      out
    },
    oracle = Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT doc_id - doc_id % 5) AS BIGINT) AS n_groups,
             TRUE AS no_cross_merge, TRUE AS whole_ok
      FROM documents"""))

  /** Z-order (Morton) interleave of the low 28 bits of key `a` (even
    * bit positions) and key `b` (odd positions), rendered per dialect
    * from ONE bit loop so Spark and the oracle compute bit-identical
    * values. Disjoint bit positions sum with `+` — no bitwise-or
    * dialect differences. 28 bits per key: keys to 2^28 (~268M)
    * interleave alias-free with z < 2^56 (the earlier 16-bit width
    * aliased partkeys past 65k — i.e. any sf ≥ ~0.33 — which silently
    * degenerates the clustering audit while still matching the
    * oracle); past 2^28, right-shift the keys into range first. */
  private def zOrderSql(a: String, b: String, spark: Boolean): String =
    (0 until 28).flatMap { i =>
      if (spark)
        Seq(s"shiftleft(shiftright($a, $i) & 1, ${2 * i})",
          s"shiftleft(shiftright($b, $i) & 1, ${2 * i + 1})")
      else
        Seq(s"((($a >> $i) & 1) << ${2 * i})",
          s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " + ", ")")

  /** Z-order clustering audit: interleave (l_partkey, l_suppkey) into
    * a Morton value, bucket by FIXED value ranges (top 6 z bits — a
    * pure map, no global sort, no single-partition window), and report
    * each bucket's row count and per-dimension key spans. This is the
    * layout step a 100 TB table runs before writing multi-dimension-
    * filtered data (Delta/Iceberg OPTIMIZE ZORDER BY): sorting by z
    * co-locates rows that are close in BOTH keys, so min/max file
    * stats prune 2-D predicates — the tight per-bucket spans this
    * query reports are exactly the pruning the layout buys. At scale
    * the same z expression feeds repartitionByRange(z) + sortWithin-
    * Partitions before the write; the audit here is shuffle-free. */
  val tZorder: QueryDef = QueryDef(
    fn = (s, dir) => {
      val z = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          expr(zOrderSql("l_partkey", "l_suppkey", spark = true)).as("z"))
      // 64 value-range buckets normalized to the observed z span (one
      // scalar agg + broadcast — key widths vary with SF, a fixed
      // granularity collapses small corpora into one bucket)
      val zmax = z.agg(max(col("z")).as("zmax"))
      z.crossJoin(broadcast(zmax))
        .withColumn("bucket", expr("(z * 64) div (zmax + 1)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
          min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
        .orderBy(col("bucket"))
    },
    oracle = Some(s"""
      WITH z AS (
        SELECT l_partkey, l_suppkey,
               ${zOrderSql("l_partkey", "l_suppkey", spark = false)} AS z
        FROM lineitem),
      zm AS (SELECT max(z) AS zmax FROM z)
      SELECT (z * 64) // (zmax + 1) AS bucket,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(min(l_partkey) AS BIGINT) AS pk_min,
             CAST(max(l_partkey) AS BIGINT) AS pk_max,
             CAST(min(l_suppkey) AS BIGINT) AS sk_min,
             CAST(max(l_suppkey) AS BIGINT) AS sk_max
      FROM z, zm GROUP BY bucket
      ORDER BY bucket"""))

  /** q_zonemap — DATA-SKIPPING audit, the measured PAYOFF of the
    * [[tZorder]] layout step: build the zone map (per-block min/max
    * of both filter keys) for TWO physical layouts of the same rows —
    * natural arrival order (l_orderkey blocks: how the files land
    * without an OPTIMIZE) and the z-order buckets — then evaluate a
    * 4×4 grid of 2-D range predicates against each map and report
    * blocks scanned. Measured: the natural layout scans 100% of
    * blocks for EVERY 2-D predicate (each block spans the full key
    * ranges) while z-order scans 26%/31% (sf0.01/sf0.1) — the number
    * that justifies running the layout job, produced by the same
    * min/max-stat pruning a parquet/Iceberg reader applies.
    *
    * Scale: both zone maps are one map-side-combined aggregate over
    * arithmetic block ids (no global sort, no single-partition
    * window); the pruning evaluation is blocks×16 rows against a
    * broadcast predicate grid — bounded by block count, never rows. */
  val qZonemap: QueryDef = QueryDef(
    fn = (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
          col("l_orderkey").as("ok"),
          expr(zOrderSql("l_partkey", "l_suppkey", spark = true)).as("z"))
      val st = li.agg(max(col("z")).as("zmax"), max(col("ok")).as("okmax"),
        min(col("pk")).as("pkmin"), max(col("pk")).as("pkmax"),
        min(col("sk")).as("skmin"), max(col("sk")).as("skmax"))
      val withSt = li.crossJoin(broadcast(st))
      def zoneMap(layout: String, blk: org.apache.spark.sql.Column) =
        withSt.groupBy(lit(layout).as("layout"), blk.as("blk"))
          .agg(min(col("pk")).as("bpkmin"), max(col("pk")).as("bpkmax"),
            min(col("sk")).as("bskmin"), max(col("sk")).as("bskmax"))
      val blocks = zoneMap("natural", expr("(ok * 64) div (okmax + 1)"))
        .unionByName(zoneMap("zorder", expr("(z * 64) div (zmax + 1)")))
      val preds = st.crossJoin(
          s.range(4).select(col("id").as("i")))
        .crossJoin(s.range(4).select(col("id").as("j")))
        .select(
          expr("pkmin + i * (pkmax - pkmin + 1) div 4").as("plo"),
          expr("pkmin + (i+1) * (pkmax - pkmin + 1) div 4 - 1").as("phi"),
          expr("skmin + j * (skmax - skmin + 1) div 4").as("slo"),
          expr("skmin + (j+1) * (skmax - skmin + 1) div 4 - 1").as("shi"))
      blocks.crossJoin(broadcast(preds))
        .groupBy(col("layout"))
        .agg((count(lit(1)) / 16).cast("long").as("n_blocks"),
          lit(16L).as("n_preds"),
          sum((col("bpkmax") >= col("plo") && col("bpkmin") <= col("phi") &&
            col("bskmax") >= col("slo") && col("bskmin") <= col("shi"))
            .cast("long")).as("scanned"))
        .withColumn("scan_ppm",
          expr("(scanned * 1000000) div (n_blocks * 16)"))
        .orderBy(col("layout"))
    },
    oracle = Some(s"""
      WITH li AS (
        SELECT l_partkey AS pk, l_suppkey AS sk, l_orderkey AS ok,
               ${zOrderSql("l_partkey", "l_suppkey", spark = false)} AS z
        FROM lineitem),
      st AS (
        SELECT max(z) AS zmax, max(ok) AS okmax,
               min(pk) AS pkmin, max(pk) AS pkmax,
               min(sk) AS skmin, max(sk) AS skmax
        FROM li),
      blocks AS (
        SELECT 'natural' AS layout, (ok * 64) // (okmax + 1) AS blk,
               min(pk) AS bpkmin, max(pk) AS bpkmax,
               min(sk) AS bskmin, max(sk) AS bskmax
        FROM li, st GROUP BY 1, 2
        UNION ALL
        SELECT 'zorder', (z * 64) // (zmax + 1),
               min(pk), max(pk), min(sk), max(sk)
        FROM li, st GROUP BY 1, 2),
      preds AS (
        SELECT pkmin + i.i * (pkmax - pkmin + 1) // 4 AS plo,
               pkmin + (i.i+1) * (pkmax - pkmin + 1) // 4 - 1 AS phi,
               skmin + j.j * (skmax - skmin + 1) // 4 AS slo,
               skmin + (j.j+1) * (skmax - skmin + 1) // 4 - 1 AS shi
        FROM generate_series(0, 3) i(i), generate_series(0, 3) j(j), st),
      scan AS (
        SELECT layout, count(*) AS pairs,
               sum(CASE WHEN bpkmax >= plo AND bpkmin <= phi
                         AND bskmax >= slo AND bskmin <= shi
                    THEN 1 ELSE 0 END) AS scanned
        FROM blocks, preds GROUP BY layout),
      nb AS (SELECT layout, count(*) AS n_blocks FROM blocks GROUP BY 1)
      SELECT s.layout, CAST(n_blocks AS BIGINT) AS n_blocks,
             CAST(16 AS BIGINT) AS n_preds,
             CAST(scanned AS BIGINT) AS scanned,
             CAST((scanned * 1000000) // pairs AS BIGINT) AS scan_ppm
      FROM scan s JOIN nb USING (layout) ORDER BY s.layout"""))

  /** t_freq_sketch — mergeable FREQUENCY sketch contract, completing
    * the sketch family next to q_hll_sketch (distinct) and
    * q_quantile_sketch (rank): a Count-Min sketch
    * (org.apache.spark.util.sketch, built by the distributed
    * treeAggregate under DataFrame.stat.countMinSketch) over the
    * corpus token stream, probed at the EXACT top-20 tokens. CMS
    * guarantees are one-sided — an estimate never undercounts, and
    * overcounts by at most ε·N with the configured confidence — so
    * the contract row pins the exact floor and a 4·ε·N ceiling (see
    * the slack note at the computation for why the ceiling carries
    * headroom over the per-probe confidence bound). The
    * 100 TB story: the sketch is fixed-size (ε=1e-4, δ=0.01 →
    * ~2.7 MB), map-side mergeable, and answers any-token frequency
    * after the corpus is gone — where the exact top-20 leg costs a
    * full token shuffle.
    *
    * Sketch internals aren't SQL-replayable, so (as with
    * q_hll_sketch) the estimates themselves stay OUT of the output;
    * the oracle pins the exact counts and the two boolean bounds. */
  val tFreqSketch: QueryDef = QueryDef(
    fn = (s, dir) => {
      import graft.functions.{TextFunctions => TF}
      // three actions read the exploded stream (count, sketch build,
      // exact top-20) — persist so the tokenize+explode runs once
      val toks = Tables.load(s, dir, "documents")
        .select(explode(TF.tokens(col("text"))).as("token"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nTotal = toks.count()
      val eps = 1e-4
      val cms = toks.stat.countMinSketch("token", eps, 0.99, 42)
      // bound_ok slack: the CMS guarantee is est <= exact + ε·N only
      // WITH CONFIDENCE δ=0.99 per probe — 20 probes give ~18% odds of
      // at least one excursion over εN on an adversarial dataset, so
      // pinning exactly εN in an oracle contract would make the suite
      // flaky on a new SF/seed with no code defect. The contract pins
      // 4·ε·N instead: each CMS row overshoots εN with prob < 1/e
      // (Markov), all 5 independent rows together < e^-5 ≈ 0.7%, and
      // the min-over-rows estimate exceeding FOUR εN needs every row
      // 4x over its mean excess — < (1/4e)^5 ≈ 1e-6 per probe. The
      // one-sided floor (never undercounts) stays exact: it is a
      // structural property, not probabilistic.
      val top = toks.groupBy(col("token"))
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("token"))
        .limit(20)
        .collect()
      toks.unpersist()
      val slack = 4L * math.ceil(eps * nTotal).toLong
      val rows = top.zipWithIndex.map { case (r, i) =>
        val est = cms.estimateCount(r.getString(0))
        (i + 1L, r.getString(0), r.getLong(1),
          est >= r.getLong(1), est <= r.getLong(1) + slack)
      }
      s.createDataFrame(rows.toSeq)
        .toDF("rnk", "token", "n_exact", "one_sided_ok", "bound_ok")
    },
    oracle = Some("""
      WITH tok AS (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
                 AS token
        FROM documents),
      top AS (
        SELECT token, CAST(count(*) AS BIGINT) AS n_exact
        FROM tok GROUP BY token
        ORDER BY n_exact DESC, token LIMIT 20)
      SELECT CAST(row_number() OVER (ORDER BY n_exact DESC, token) AS BIGINT)
               AS rnk,
             token, n_exact, TRUE AS one_sided_ok, TRUE AS bound_ok
      FROM top ORDER BY rnk"""))

  /** d_corpus_diff — snapshot diff between corpus versions: v2 is a
    * deterministic mutation of the corpus (salted-md5 draws: ~4% of
    * docs removed, ~8% edited, ~5% re-added under fresh ids), and the
    * diff classifies every id across both versions by full-outer join
    * on (id, content hash) into added/removed/changed/unchanged,
    * rolled up per source — the release-note accounting a corpus
    * VERSIONING workflow runs between snapshots (what changed since
    * the data the last model trained on?).
    *
    * Scale: two content-hash projections and one full-outer join
    * keyed on doc_id; the rollup output is |sources|×4 rows. No
    * windows, no skew (doc_id is unique on both sides). */
  val dCorpusDiff: QueryDef = QueryDef(
    fn = (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      def draw(salt: String) = substring(
        md5(concat(lit(salt), col("doc_id").cast("string"))), 1, 2)
      val v1 = docs.select(col("doc_id"), col("source").as("src1"),
        md5(col("text")).as("h1"))
      val v2base = docs.filter(draw("del:") >= "0a")
        .select(col("doc_id"), col("source").as("src2"),
          md5(when(draw("mod:") < "15", concat(col("text"), lit(" v2marker")))
            .otherwise(col("text"))).as("h2"))
      // re-added docs get fresh ids in the NEGATIVE id space
      // (-(doc_id+1), the q_merge device) — an additive offset would
      // collide with real ids once the corpus outgrows it and silently
      // misclassify rows, identically in both engines, so no oracle
      // would catch it
      val v2new = docs.filter(draw("add:") < "0d")
        .select((-(col("doc_id") + 1L)).as("doc_id"),
          col("source").as("src2"),
          md5(concat(col("text"), lit(" newdoc"))).as("h2"))
      v1.join(v2base.union(v2new), Seq("doc_id"), "full_outer")
        .select(coalesce(col("src1"), col("src2")).as("source"),
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") === col("h2"), "unchanged")
            .otherwise("changed").as("status"))
        .groupBy(col("source"), col("status"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"), col("status"))
    },
    oracle = Some("""
      WITH v1 AS (
        SELECT doc_id, source AS src1, md5(text) AS h1 FROM documents),
      v2 AS (
        SELECT doc_id, source AS src2,
               CASE WHEN substring(md5('mod:' || CAST(doc_id AS VARCHAR)),
                                   1, 2) < '15'
                    THEN md5(text || ' v2marker') ELSE md5(text) END AS h2
        FROM documents
        WHERE substring(md5('del:' || CAST(doc_id AS VARCHAR)), 1, 2) >= '0a'
        UNION ALL
        SELECT -(doc_id + 1), source, md5(text || ' newdoc')
        FROM documents
        WHERE substring(md5('add:' || CAST(doc_id AS VARCHAR)), 1, 2) < '0d'),
      d AS (
        SELECT coalesce(src1, src2) AS source,
               CASE WHEN h1 IS NULL THEN 'added'
                    WHEN h2 IS NULL THEN 'removed'
                    WHEN h1 = h2 THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM v1 FULL OUTER JOIN v2 USING (doc_id))
      SELECT source, status, CAST(count(*) AS BIGINT) AS n_docs
      FROM d GROUP BY source, status
      ORDER BY source, status"""))

  /** d_dedup_cascade — the production dedup PIPELINE as one query:
    * exact dedup first (cheap content-hash pass), then minhash
    * near-dup clustering over the exact survivors, with per-stage
    * drop accounting — order matters (exact-first shrinks the
    * expensive near-dup stage's input) and the stage ledger is what a
    * data-governance report wants. Output: one row per stage with
    * (n_remaining, n_dropped).
    *
    * The oracle replays both stages from first principles: exact
    * survivors by content-hash row_number, then the brute Jaccard
    * pair set RESTRICTED to survivor endpoints — valid because pair
    * predicates are pairwise, so pairs(subset) = pairs(corpus) ∩
    * subset² and LSH bucketing per doc is subset-independent —
    * then the same recursive closure as d_dedup_clusters.
    *
    * Scale: inherits the stages' own proven shapes; the ledger is
    * three 1-row aggregates stacked. */
  val dDedupCascade: QueryDef = QueryDef(
    fn = (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val s1 = Dedup.exact(docs, "text", "doc_id")
        .filter(!col("is_dup")).select(col("doc_id"))
      val docs1 = docs.join(s1, "doc_id")
      val s2 = Dedup.clusters(
        Dedup.minhashPairs(docs1, "text", "doc_id",
          numHashes = 64, bands = 16),
        universe = Some(docs1.select(col("doc_id"))))
        .filter(col("is_canonical"))
      docs.agg(count(lit(1)).as("n0"))
        .crossJoin(s1.agg(count(lit(1)).as("n1")))
        .crossJoin(s2.agg(count(lit(1)).as("n2")))
        .selectExpr("""stack(3,
            '1_input',    n0, CAST(0 AS BIGINT),
            '2_exact',    n1, n0 - n1,
            '3_near_dup', n2, n1 - n2)
          AS (stage, n_remaining, n_dropped)""")
        .orderBy(col("stage"))
    },
    oracle = Some(s"""
      WITH RECURSIVE ${Pipeline.shinglePairsSql},
      surv1 AS (
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (PARTITION BY md5(text)
                   ORDER BY doc_id) AS rn
          FROM documents) WHERE rn = 1),
      sp AS (
        SELECT id_a, id_b FROM jpairs
        WHERE id_a IN (SELECT doc_id FROM surv1)
          AND id_b IN (SELECT doc_id FROM surv1)),
      edges AS (SELECT id_a AS src, id_b AS dst FROM sp
                UNION SELECT id_b, id_a FROM sp),
      reach AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
      noncanon AS (
        SELECT src AS id FROM reach GROUP BY src
        HAVING src <> least(src, min(dst))),
      n0 AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM documents),
      n1 AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM surv1),
      n2 AS (SELECT CAST((SELECT n1 FROM n1) - count(*) AS BIGINT) AS n2
             FROM noncanon)
      SELECT '1_input' AS stage, n0 AS n_remaining, CAST(0 AS BIGINT)
               AS n_dropped FROM n0
      UNION ALL
      SELECT '2_exact', n1, (SELECT n0 FROM n0) - n1 FROM n1
      UNION ALL
      SELECT '3_near_dup', n2, (SELECT n1 FROM n1) - n2 FROM n2
      ORDER BY stage"""))

  val defs: Map[String, QueryDef] = Map(
    "d_corpus_diff" -> dCorpusDiff,
    "d_dedup_cascade" -> dDedupCascade,
    "t_freq_sketch" -> tFreqSketch,
    "t_zorder" -> tZorder,
    "q_zonemap" -> qZonemap,
    "t_domain_cap" -> tDomainCap,
    "d_dedup_delta" -> dDedupDelta,
    "d_dedup_delta_stored" -> dDedupDeltaStored,
    "s_delta_dedup" -> sDeltaDedup,
    "d_dedup_report" -> dDedupReport,
    "t_compress" -> tCompress,
    "t_compress_contract" -> tCompressContract,
    "m_modal_phash" -> mModalPhash,
    "m_modal_phash_contract" -> mModalPhashContract,
    "m_dedup_phash" -> mDedupPhash,
    "m_dedup_phash_contract" -> mDedupPhashContract)
}
