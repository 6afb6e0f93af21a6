package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * corpus. Window partitions by source — each domain's rank is
    * computed inside its own partition, no global ordering, so the
    * operator scales with the number of domains, not corpus size. */
  val tDomainCap: QueryDef = QueryDef(
    fn = (s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 12)
        .orderBy(col("doc_id"))
    },
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

  val defs: Map[String, QueryDef] = Map(
    "t_domain_cap" -> tDomainCap,
    "d_dedup_delta" -> dDedupDelta,
    "d_dedup_report" -> dDedupReport)
}
