package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text retrieval + data-selection scoring over the documents corpus —
  * the query-side operators a training-data pipeline runs to FIND data
  * (BM25 keyword retrieval), DESCRIBE it (per-document TF-IDF terms),
  * and SELECT it against a target distribution (hashed-n-gram
  * importance weights, the DSIR recipe of Xie et al., "Data Selection
  * for Language Models via Importance Resampling", NeurIPS 2023).
  *
  * Every score here is computed in ALL-INTEGER algebra (the repo's
  * oracle convention, see [[Pipeline]].tOutlier): ratios are rendered
  * as exact BIGINT expressions with explicit integer division instead
  * of float idf/log terms, so Spark and the DuckDB oracle decide
  * every comparison identically — no ulp-sensitive `ln` in either
  * engine. The quantization (a floor at 3-4 decimal digits of the
  * classical formulas) is documented per operator; ordering ties are
  * always broken by id so top-k cutoffs are engine-identical too.
  */
object Retrieval {

  /** Integer idf: floor((N - df + 0.5) / (df + 0.5) * 1000) rendered
    * exactly over BIGINTs as (2N - 2df + 1) * 1000 div (2df + 1) —
    * the BM25 idf numerator/denominator each scaled by 2 so the two
    * half-counts become integers. Bound: N * 2000 must stay under
    * 2^63 — fine to ~4e15 documents. */
  private val idfSql = "((2 * n_docs - 2 * df + 1) * 1000) // (2 * df + 1)"
  private val idfSpark = "((2 * n_docs - 2 * df + 1) * 1000) div (2 * df + 1)"

  /** Top-5 TF-IDF terms per document — the per-doc keyword profile
    * used for corpus browsing and topic drift audits.
    *
    * Scale shape: tf is one explode + (doc_id, token) partial-agg
    * (map-side combined); df folds tf by token (vocab-sized, NOT
    * corpus-sized); the scalar doc count broadcasts via crossJoin of
    * a 1-row aggregate; the final window partitions by doc_id — no
    * global window, no driver loop. Both shuffles (token, doc_id) are
    * key-partitioned and survive a 1000x corpus. */
  val tTfidf: QueryDef = QueryDef(
    fn = (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val tf = docs
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("token"))
      tf.join(dfreq, "token")
        .crossJoin(broadcast(n))
        .withColumn("score", col("tf") * expr(idfSpark))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("doc_id"), col("rnk"), col("token"), col("tf"),
          col("df"), col("score"))
        .orderBy(col("doc_id"), col("rnk"))
    },
    oracle = Some(s"""
      WITH tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
        FROM documents),
      tf AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY 1, 2),
      dfreq AS (
        SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      scored AS (
        SELECT doc_id, token, tf, df, tf * ($idfSql) AS score
        FROM tf JOIN dfreq USING (token), n)
      SELECT doc_id, rnk, token, tf, df, score
      FROM (SELECT *,
              CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, token) AS BIGINT) AS rnk
            FROM scored)
      WHERE rnk <= 5
      ORDER BY doc_id, rnk"""))

  /** The fixed keyword benchmark: three queries over the corpus
    * vocabulary, shared verbatim by the Spark side and the oracle. */
  private val bm25Queries: Seq[(Long, String)] = Seq(
    1L -> "spark join filter",
    2L -> "vector hash merge",
    3L -> "customer query order window")

  /** BM25 top-10 retrieval (k1 = 1.2, b = 0.75) with both the idf and
    * the tf-normalization term rendered as exact integer ratios:
    * with k1 = 6/5, b = 3/4 and avgdl = total/N, the classical
    * tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)) multiplies through to
    * 22·tf·total / (10·tf·total + 3·total + 9·dl·N) — BIGINT-exact —
    * which is floored at 4 digits and scaled by the integer idf. The
    * per-(doc,term) contribution is an integer, so the document score
    * is an ORDER-FREE integer sum: no float accumulation ordering to
    * diverge between engines. Bound: 22·tf·total·10⁴ under 2^63 —
    * fine to ~4e13 corpus tokens at tf ≤ 10³.
    *
    * Scale shape: corpus tokens are filtered against the broadcast
    * term list BEFORE the (doc_id, token) aggregation, so the shuffle
    * carries only matching postings (the inverted-index slice, not
    * the corpus); the doc length rides the posting rows (no separate
    * corpus scan or doc_id-keyed lens join); df and the corpus
    * scalars are 1-to-tens-of-rows broadcasts; top-10 per query is
    * the two-phase (query_id, input-split) rank — see the inline
    * comment for the two rejected shapes. */
  val tBm25: QueryDef = QueryDef(
    fn = (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val qdf = s.createDataFrame(bm25Queries).toDF("query_id", "qtext")
      val qterms = qdf.select(col("query_id"),
        explode(TF.tokens(col("qtext"))).as("token"))
      val termSet = qterms.select(col("token")).distinct()
      // the doc length rides the posting rows (first(dl) per group) —
      // a separate lens table would re-scan the corpus AND shuffle it
      // by doc_id just to re-attach one integer
      val tf = docs
        .select(col("doc_id"), TF.tokens(col("text")).as("ts"))
        .select(col("doc_id"), size(col("ts")).cast("long").as("dl"),
          explode(col("ts")).as("token"))
        .join(broadcast(termSet), "token")
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val stats = docs.agg(count(lit(1)).as("n_docs"),
        sum(TF.tokenCountWs(col("text"))).as("total"))
      val contrib = tf
        .join(broadcast(qterms), "token")
        .crossJoin(broadcast(stats))
        .join(broadcast(dfreq), "token")
        .withColumn("t1", expr(
          "(22 * tf * total * 10000) div (10 * tf * total + 3 * total + 9 * dl * n_docs)"))
        .withColumn("c", expr(idfSpark) * col("t1"))
      val score = contrib.groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("c")).as("score"))
      // top-10 per query via the shared two-phase rank ([[Ranking]]):
      // a single window partitioned by query_id would funnel every
      // scored posting for a query into ONE partition at any corpus
      // size; a TakeOrdered per query (the first fix) re-evaluated the
      // whole scoring subtree once PER QUERY (3x the corpus work,
      // visible as triplicated scans in the archived plan).
      Ranking.topKPerGroup(score, Seq(col("query_id")),
          Seq(col("score").desc, col("doc_id")), 10, "rnk")
        .select(col("query_id"), col("rnk"), col("doc_id"), col("score"))
        .orderBy(col("query_id"), col("rnk"))
    },
    oracle = Some(s"""
      WITH q(query_id, qtext) AS (VALUES
        ${bm25Queries.map { case (i, t) => s"(CAST($i AS BIGINT), '$t')" }
          .mkString(", ")}),
      qt AS (
        SELECT query_id,
               unnest(regexp_split_to_array(lower(trim(qtext)), '\\s+')) AS token
        FROM q),
      tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
        FROM documents),
      tf AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        FROM tok WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
      dfreq AS (
        SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      lens AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS dl
        FROM documents),
      st AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(dl) AS BIGINT) AS total
        FROM lens),
      contrib AS (
        SELECT query_id, doc_id,
               ($idfSql) *
               ((22 * tf * total * 10000)
                // (10 * tf * total + 3 * total + 9 * dl * n_docs)) AS c
        FROM tf JOIN qt USING (token) JOIN dfreq USING (token)
             JOIN lens USING (doc_id), st),
      sc AS (
        SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score
        FROM contrib GROUP BY 1, 2)
      SELECT query_id, rnk, doc_id, score
      FROM (SELECT *,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
            FROM sc)
      WHERE rnk <= 10
      ORDER BY query_id, rnk"""))

  /** t_retrieval_eval — OFFLINE RETRIEVAL EVALUATION (the harness
    * every retrieval stack runs before shipping a ranker change):
    * precision@5, recall@10, and MRR for the [[tBm25]] ranking over
    * the fixed keyword benchmark, against a DERIVABLE relevance
    * ground truth — a document is relevant to a query iff it contains
    * ALL the query's terms (boolean-AND relevance, objective and
    * replayable in any engine; the judgment-file analogue). MRR rides
    * as 10⁶ div first-relevant-rank (0 when no relevant doc is
    * retrieved) and recall as integer ppm, so every metric is an
    * exact integer in both engines. Measured here: the BM25 top-10 is
    * all-relevant on this corpus (P@5 = 5/5, MRR = 1.0) while
    * recall@10 is small (thousands of AND-matching docs, ten
    * retrieved) — exactly the precision/recall trade a 10-deep
    * cutoff should show.
    *
    * Scale: relevance is a broadcast term-set semi-join + one
    * map-side-combined (query, doc) count; the ranked list is 30
    * rows; nothing beyond tBm25's own scan touches the corpus. */
  val tRetrievalEval: QueryDef = QueryDef(
    fn = (s, dir) => {
      val ranked = tBm25.fn(s, dir)
        .select(col("query_id"), col("doc_id"), col("rnk"))
      val docs = Tables.load(s, dir, "documents")
      val qdf = s.createDataFrame(bm25Queries).toDF("query_id", "qtext")
      val qterms = qdf.select(col("query_id"),
        explode(TF.tokens(col("qtext"))).as("token"))
      val nq = qterms.groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_terms"))
      val rel = docs
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
        .join(broadcast(qterms), "token")
        .select(col("query_id"), col("doc_id"), col("token")).distinct()
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("m"))
        .join(broadcast(nq), "query_id")
        .filter(col("m") === col("n_terms"))
        .select(col("query_id"), col("doc_id"))
      val nRel = rel.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
      ranked
        .join(rel.withColumn("is_rel", lit(1L)),
          Seq("query_id", "doc_id"), "left")
        .groupBy(col("query_id"))
        .agg(
          sum(when(col("rnk") <= 5 && col("is_rel").isNotNull, 1L)
            .otherwise(0L)).as("hits5"),
          sum(when(col("is_rel").isNotNull, 1L).otherwise(0L)).as("hits10"),
          coalesce(min(when(col("is_rel").isNotNull, col("rnk"))), lit(0L))
            .as("first_rel"))
        .join(nRel, Seq("query_id"), "left")
        .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
        .select(col("query_id"), col("n_rel"), col("hits5"), col("hits10"),
          expr("CASE WHEN n_rel = 0 THEN 0 " +
            "ELSE (hits10 * 1000000) div n_rel END").as("recall10_ppm"),
          expr("CASE WHEN first_rel = 0 THEN 0 " +
            "ELSE 1000000 div first_rel END").as("mrr_ppm"))
        .orderBy(col("query_id"))
    },
    oracle = Some(s"""
      WITH q(query_id, qtext) AS (VALUES
        ${bm25Queries.map { case (i, t) => s"(CAST($i AS BIGINT), '$t')" }
          .mkString(", ")}),
      qt AS (
        SELECT query_id,
               unnest(regexp_split_to_array(lower(trim(qtext)), '\\s+')) AS token
        FROM q),
      nq AS (SELECT query_id, count(*) AS n_terms FROM qt GROUP BY 1),
      tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
        FROM documents),
      tf AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        FROM tok WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
      dfreq AS (
        SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      lens AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS dl
        FROM documents),
      st AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(dl) AS BIGINT) AS total
        FROM lens),
      contrib AS (
        SELECT query_id, doc_id,
               ($idfSql) *
               ((22 * tf * total * 10000)
                // (10 * tf * total + 3 * total + 9 * dl * n_docs)) AS c
        FROM tf JOIN qt USING (token) JOIN dfreq USING (token)
             JOIN lens USING (doc_id), st),
      sc AS (
        SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score
        FROM contrib GROUP BY 1, 2),
      ranked AS (
        SELECT query_id, doc_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
        FROM sc),
      rel AS (
        SELECT qt.query_id, t2.doc_id
        FROM (SELECT DISTINCT doc_id, token FROM tok) t2 JOIN qt USING (token)
        GROUP BY 1, 2
        HAVING count(*) = (SELECT n_terms FROM nq
                           WHERE nq.query_id = qt.query_id)),
      m AS (
        SELECT r.query_id,
               (SELECT CAST(count(*) AS BIGINT) FROM rel
                WHERE rel.query_id = r.query_id) AS n_rel,
               CAST(sum(CASE WHEN rnk <= 5 AND rel.doc_id IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS hits5,
               CAST(sum(CASE WHEN rel.doc_id IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS hits10,
               CAST(coalesce(min(CASE WHEN rel.doc_id IS NOT NULL
                 THEN rnk END), 0) AS BIGINT) AS first_rel
        FROM ranked r LEFT JOIN rel
          ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
        WHERE rnk <= 10
        GROUP BY r.query_id)
      SELECT query_id, n_rel, hits5, hits10,
             CAST(CASE WHEN n_rel = 0 THEN 0
               ELSE (hits10 * 1000000) // n_rel END AS BIGINT) AS recall10_ppm,
             CAST(CASE WHEN first_rel = 0 THEN 0
               ELSE 1000000 // first_rel END AS BIGINT) AS mrr_ppm
      FROM m ORDER BY query_id"""))

  /** t_hybrid_search — HYBRID lexical+vector retrieval (the modern
    * search stack's default shape: BM25 and embedding-cosine rankings
    * fused by reciprocal rank, Cormack et al. SIGIR'09 — what
    * Elasticsearch/Vespa/pgvector deployments run as "hybrid mode"):
    * the [[tBm25]] top-10 per keyword query fused with the cosine
    * top-10 of the query's probe vector over the documents' vectors
    * (vec_id = doc_id rows of the embeddings table),
    * [[Ranking.rrfFuse]] integer scores, fused top-5. Measured
    * property worth keeping: NO document appears in both lists on
    * this corpus (n_lists = 1 throughout) — the embedding space is
    * unrelated to the token space, the same near-random-structure
    * property d_cluster_silhouette and d_knn_descent_recall measure;
    * the summed-contribution path is therefore pinned by a hand spec
    * where an everywhere-mid doc must beat top-ranked-once docs.
    *
    * Scale: the vector leg is one broadcast-3-probes scan (zero
    * corpus shuffle, the d_ann_brute shape) through the hot-safe
    * two-phase rank; fusion runs on 2×10 rows per query. */
  val tHybridSearch: QueryDef = QueryDef(
    fn = (s, dir) => {
      val lex = tBm25.fn(s, dir)
        .select(col("query_id"), col("doc_id"), col("rnk"))
      val emb = Tables.load(s, dir, "embeddings")
      val docs = Tables.load(s, dir, "documents")
      val qv = emb.filter(col("vec_id").isin(bm25Queries.map(_._1): _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val dv = emb.join(docs.select(col("doc_id")),
          emb("vec_id") === docs("doc_id"))
        .select(col("doc_id"), col("embedding").as("dvec"))
      val scored = dv.crossJoin(broadcast(qv))
        .filter(col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id"),
          expr("cast(round(graft_cosine(qvec, dvec) * 10000) as bigint)")
            .as("cosm"))
      val vec = Ranking.topKPerGroup(scored, Seq(col("query_id")),
          Seq(col("cosm").desc, col("doc_id")), 10, "rnk")
        .select(col("query_id"), col("doc_id"), col("rnk"))
      Ranking.rrfFuse(lex.unionByName(vec))
        .orderBy(col("query_id"), col("rnk"))
    },
    oracle = Some(s"""
      WITH q(query_id, qtext) AS (VALUES
        ${bm25Queries.map { case (i, t) => s"(CAST($i AS BIGINT), '$t')" }
          .mkString(", ")}),
      qt AS (
        SELECT query_id,
               unnest(regexp_split_to_array(lower(trim(qtext)), '\\s+')) AS token
        FROM q),
      tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
        FROM documents),
      tf AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        FROM tok WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
      dfreq AS (
        SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      lens AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS dl
        FROM documents),
      st AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(dl) AS BIGINT) AS total
        FROM lens),
      contrib AS (
        SELECT query_id, doc_id,
               ($idfSql) *
               ((22 * tf * total * 10000)
                // (10 * tf * total + 3 * total + 9 * dl * n_docs)) AS c
        FROM tf JOIN qt USING (token) JOIN dfreq USING (token)
             JOIN lens USING (doc_id), st),
      lexsc AS (
        SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score
        FROM contrib GROUP BY 1, 2),
      lex AS (
        SELECT query_id, doc_id, rnk FROM (
          SELECT query_id, doc_id,
                 CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
          FROM lexsc) WHERE rnk <= 10),
      qv AS (
        SELECT q.query_id, e.embedding AS v
        FROM q JOIN embeddings e ON e.vec_id = q.query_id),
      dv AS (
        SELECT d.doc_id, e.embedding AS v
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
      vel AS (
        SELECT qv.query_id, dv.doc_id,
               CAST(unnest(qv.v) AS DOUBLE) AS qe,
               CAST(unnest(dv.v) AS DOUBLE) AS de
        FROM qv, dv WHERE dv.doc_id <> qv.query_id),
      vsc AS (
        SELECT query_id, doc_id,
               CAST(round(SUM(qe*de) /
                 (sqrt(SUM(qe*qe)) * sqrt(SUM(de*de))) * 10000)
                 AS BIGINT) AS cosm
        FROM vel GROUP BY 1, 2),
      vec AS (
        SELECT query_id, doc_id, rnk FROM (
          SELECT query_id, doc_id,
                 CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosm DESC, doc_id) AS BIGINT) AS rnk
          FROM vsc) WHERE rnk <= 10),
      fused AS (
        SELECT query_id, doc_id,
               CAST(sum(1000000 // (60 + rnk)) AS BIGINT) AS rrf,
               CAST(count(*) AS BIGINT) AS n_lists
        FROM (SELECT * FROM lex UNION ALL SELECT * FROM vec)
        GROUP BY 1, 2)
      SELECT query_id, rnk, doc_id, rrf, n_lists FROM (
        SELECT query_id, doc_id, rrf, n_lists,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf DESC, doc_id) AS BIGINT) AS rnk
        FROM fused) WHERE rnk <= 5
      ORDER BY query_id, rnk"""))

  private val hexAlphabet = "0123456789abcdef"

  /** DSIR-style importance weights: every token hashes (md5, identical
    * bytes in both engines) into one of 256 buckets; the target
    * distribution is the corpus' English slice, the raw distribution
    * the whole corpus; a document's weight is the sum over its tokens
    * of the bucket's add-one-smoothed likelihood ratio
    * (cnt_t + 1)/(tot_t) ÷ (cnt_r + 1)/(tot_r), rendered in integer
    * algebra as ((cnt_t+1)·10⁴ div (cnt_r+1)) · tot_r div tot_t.
    * Because the target corpus is a SUBSET of the raw corpus,
    * cnt_t ≤ cnt_r holds per bucket and the first factor is ≤ 10⁴ —
    * the product stays far under 2^63 at any corpus size (the sum of
    * ratios replaces DSIR's sum of logs: same ordering for selection,
    * zero `ln` calls to diverge on). `selected` marks docs whose
    * per-token weight clears the neutral ratio 10⁴·(tot_r/tot_t)
    * rendered as 10⁴·tot_r div tot_t — "looks more like the target
    * than the average document does".
    *
    * Scale shape: the bucket table is 256 rows (a broadcast by
    * construction at any corpus size — THE point of hashed features in
    * DSIR); the corpus makes two passes (bucket counts, then weight
    * sum), both map-side-combined aggs; nothing driver-side. */
  val tDsir: QueryDef = QueryDef(
    fn = (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      def hexVal(i: Int) =
        instr(lit(hexAlphabet), substring(md5(col("token").cast("binary")), i, 1)) - 1
      val btoks = docs
        .select(col("doc_id"), col("lang"),
          explode(TF.tokens(col("text"))).as("token"))
        .withColumn("bucket", (hexVal(1) * 16 + hexVal(2)).cast("long"))
      val bstats = btoks.groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt_r"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cnt_t"))
      val tots = bstats.agg(sum(col("cnt_r")).as("tot_r"),
        sum(col("cnt_t")).as("tot_t"))
      val ratios = bstats.crossJoin(broadcast(tots))
        .withColumn("ratio_r",
          expr("((((cnt_t + 1) * 10000) div (cnt_r + 1)) * tot_r) div tot_t"))
        .withColumn("neutral", expr("(10000 * tot_r) div tot_t"))
        .select(col("bucket"), col("ratio_r"), col("neutral"))
      btoks.join(broadcast(ratios), "bucket")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), sum(col("ratio_r")).as("weight"),
          max(col("neutral")).as("neutral"))
        .withColumn("w_norm", expr("weight div n_grams"))
        .withColumn("selected", (col("w_norm") >= col("neutral")).cast("boolean"))
        .select(col("doc_id"), col("n_grams"), col("weight"), col("w_norm"),
          col("selected"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH tok AS (
        SELECT doc_id, lang,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        FROM documents),
      bt AS (
        SELECT doc_id, lang,
               CAST((strpos('0123456789abcdef', substring(md5(token), 1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substring(md5(token), 2, 1)) - 1)
                    AS BIGINT) AS bucket
        FROM tok),
      bstats AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS cnt_r,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
        FROM bt GROUP BY 1),
      tots AS (
        SELECT CAST(sum(cnt_r) AS BIGINT) AS tot_r,
               CAST(sum(cnt_t) AS BIGINT) AS tot_t
        FROM bstats),
      ratios AS (
        SELECT bucket,
               ((((cnt_t + 1) * 10000) // (cnt_r + 1)) * tot_r) // tot_t AS ratio_r,
               (10000 * tot_r) // tot_t AS neutral
        FROM bstats, tots)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(ratio_r) AS BIGINT) AS weight,
             CAST(sum(ratio_r) AS BIGINT) // CAST(count(*) AS BIGINT) AS w_norm,
             (CAST(sum(ratio_r) AS BIGINT) // CAST(count(*) AS BIGINT))
               >= max(neutral) AS selected
      FROM bt JOIN ratios USING (bucket)
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** Corpus word-frequency table — the compression every published
    * BPE trainer starts from (GPT-2's, HF tokenizers): the corpus
    * collapses to (word, count) via one map-side-combined aggregate,
    * and every merge iteration's pair count then runs over the
    * VOCABULARY (thousands of rows) weighted by count, not the corpus
    * (billions of tokens). Measured at the 100x replica: per-token
    * pair explosion cost 95 s where the weighted-vocabulary form
    * costs ~2 s — the difference between re-scanning the corpus per
    * merge and re-scanning a lookup table. */
  private def wordCounts(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.load(s, dir, "documents")
      .select(explode(TF.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))

  private val wordCountsSql = """
      words AS (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        FROM documents),
      wc AS (
        SELECT w, CAST(count(*) AS BIGINT) AS wn
        FROM words WHERE length(w) >= 2 GROUP BY w)"""

  /** BPE merge-candidate counting — the inner loop of byte-pair
    * tokenizer training: the top-30 adjacent CHARACTER pairs inside
    * words, by corpus frequency (ties by pair), counted over the
    * word-frequency table ([[wordCounts]]) with per-word pair lists
    * weighted by word count. */
  val tBpePairs: QueryDef = QueryDef(
    fn = (s, dir) => {
      val w = Window.orderBy(col("n_occ").desc, col("pair"))
      wordCounts(s, dir)
        .select(col("wn"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("wn")).as("n_occ"))
        .orderBy(col("n_occ").desc, col("pair")).limit(30)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .select(col("rnk"), col("pair"), col("n_occ"))
        .orderBy(col("rnk"))
    },
    oracle = Some(s"""
      WITH $wordCountsSql,
      pairs AS (
        SELECT wn, unnest([substring(w, CAST(x AS INT), 2)
                           for x in range(1, length(w))]) AS pair
        FROM wc),
      cnt AS (
        SELECT pair, CAST(sum(wn) AS BIGINT) AS n_occ
        FROM pairs GROUP BY pair),
      top AS (
        SELECT pair, n_occ FROM cnt ORDER BY n_occ DESC, pair LIMIT 30)
      SELECT CAST(row_number() OVER (ORDER BY n_occ DESC, pair) AS BIGINT)
               AS rnk, pair, n_occ
      FROM top ORDER BY rnk"""))

  /** ONE BPE merge iteration end-to-end: find the top pair
    * ([[tBpePairs]]'s count), APPLY it (every occurrence collapses to
    * a single marker symbol — SQL `replace` is left-to-right
    * non-overlapping, exactly BPE's greedy application), and recount —
    * the top-10 pairs of the re-encoded corpus, marker rendered as
    * `<pair>`. This is the loop body of byte-pair tokenizer training;
    * a full trainer iterates it with the growing merge table broadcast
    * (each iteration: one map-side re-encode + one pair aggregate —
    * nothing here shuffles more than (pair, count) rows). The merge
    * target is DERIVED in-plan (1-row broadcast), not hardcoded, so
    * the query is corpus-independent. */
  val tBpeMerge: QueryDef = QueryDef(
    fn = (s, dir) => {
      val wc = wordCounts(s, dir)
      def pairCounts(df: org.apache.spark.sql.DataFrame) = df
        .select(col("mp"), col("wn"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy(col("mp"), col("pair")).agg(sum(col("wn")).as("n_occ"))
      val top1 = wc.select(lit("").as("mp"), col("w"), col("wn"))
        .transform(pairCounts)
        .orderBy(col("n_occ").desc, col("pair")).limit(1)
        .select(col("pair").as("mp"))
      // apply the merge to the VOCABULARY and re-group: distinct words
      // can collapse onto one re-encoded form, their counts sum
      val merged = wc.crossJoin(broadcast(top1))
        .select(col("mp"), expr("replace(w, mp, char(1))").as("w"), col("wn"))
        .filter(length(col("w")) >= 2)
        .groupBy(col("mp"), col("w")).agg(sum(col("wn")).as("wn"))
      val w2 = Window.orderBy(col("n_occ").desc, col("pair"))
      pairCounts(merged)
        .orderBy(col("n_occ").desc, col("pair")).limit(10)
        .withColumn("rnk", row_number().over(w2).cast("long"))
        .select(col("rnk"),
          expr("replace(pair, char(1), concat('<', mp, '>'))").as("pair"),
          col("n_occ"))
        .orderBy(col("rnk"))
    },
    oracle = Some(s"""
      WITH $wordCountsSql,
      p0 AS (
        SELECT wn, unnest([substring(w, CAST(x AS INT), 2)
                           for x in range(1, length(w))]) AS pair
        FROM wc),
      top1 AS (
        SELECT pair AS mp, CAST(sum(wn) AS BIGINT) AS n
        FROM p0 GROUP BY pair ORDER BY n DESC, mp LIMIT 1),
      mw AS (
        SELECT mp, replace(w, mp, chr(1)) AS w, wn FROM wc, top1),
      mw2 AS (
        SELECT mp, w, CAST(sum(wn) AS BIGINT) AS wn
        FROM mw WHERE length(w) >= 2 GROUP BY mp, w),
      p1 AS (
        SELECT mp, wn, unnest([substring(w, CAST(x AS INT), 2)
                               for x in range(1, length(w))]) AS pair
        FROM mw2),
      cnt AS (
        SELECT mp, pair, CAST(sum(wn) AS BIGINT) AS n_occ
        FROM p1 GROUP BY mp, pair),
      top AS (
        SELECT mp, pair, n_occ FROM cnt ORDER BY n_occ DESC, pair LIMIT 10)
      SELECT CAST(row_number() OVER (ORDER BY n_occ DESC, pair) AS BIGINT)
               AS rnk,
             replace(pair, chr(1), '<' || mp || '>') AS pair, n_occ
      FROM top ORDER BY rnk"""))

  /** t_rrf — reciprocal-rank fusion (Cormack et al., SIGIR 2009), the
    * standard hybrid-retrieval combiner: per query, the lexical
    * relevance ranking (tf·idf in the repo's integer algebra) fuses
    * with a per-document quality prior (unique-token ratio — the
    * repetition signal, higher = cleaner text) by
    * Σ 1000000 div (60 + rank). Both constituent lists are TOP-100
    * per query — RRF is defined over retrieved lists, which is also
    * what makes it scale: a document outside both lists can score at
    * most 2·10⁶/161 and is provably outside the fused top-10 long
    * before the corpus matters.
    *
    * Scale: both rankings and the fused cut run through
    * [[Ranking.topKPerGroup]] (two-phase, hot-query-safe); the fuse
    * join is 100-row-per-query lists. Everything integer, ties broken
    * by doc_id — the fused order is engine-exact. */
  val tRrf: QueryDef = QueryDef(
    fn = (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val qdf = s.createDataFrame(bm25Queries).toDF("query_id", "qtext")
      val qterms = qdf.select(col("query_id"),
        explode(TF.tokens(col("qtext"))).as("token")).distinct()
      val termSet = qterms.select(col("token")).distinct()
      val base = docs
        .select(col("doc_id"), TF.tokens(col("text")).as("ts"))
        .select(col("doc_id"), size(col("ts")).cast("long").as("dl"),
          size(array_distinct(col("ts"))).cast("long").as("du"),
          explode(col("ts")).as("token"))
        .join(broadcast(termSet), "token")
      val tf = base.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"),
          min(col("du")).as("du"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val rel = tf.join(broadcast(qterms), "token")
        .join(broadcast(dfreq), "token")
        .crossJoin(broadcast(n))
        .withColumn("c", col("tf") * expr(idfSpark))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("c")).as("rel"),
          min(expr("(1000 * du) div dl")).as("uniq"))
      val rl = Ranking.topKPerGroup(rel, Seq(col("query_id")),
        Seq(col("rel").desc, col("doc_id")), 100, "r_rel")
        .select(col("query_id"), col("doc_id"), col("r_rel"))
      val ql = Ranking.topKPerGroup(rel, Seq(col("query_id")),
        Seq(col("uniq").desc, col("doc_id")), 100, "r_q")
        .select(col("query_id"), col("doc_id"), col("r_q"))
      val fused = rl.join(ql, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("fused",
          coalesce(expr("1000000 div (60 + r_rel)"), lit(0L)) +
            coalesce(expr("1000000 div (60 + r_q)"), lit(0L)))
      Ranking.topKPerGroup(fused, Seq(col("query_id")),
          Seq(col("fused").desc, col("doc_id")), 10, "rnk")
        .select(col("query_id"), col("rnk"), col("doc_id"), col("fused"))
        .orderBy(col("query_id"), col("rnk"))
    },
    oracle = Some(s"""
      WITH q(query_id, qtext) AS (VALUES
        ${bm25Queries.map { case (i, t) => s"(CAST($i AS BIGINT), '$t')" }
          .mkString(", ")}),
      qt AS (
        SELECT DISTINCT query_id,
               unnest(regexp_split_to_array(lower(trim(qtext)), '\\s+'))
                 AS token
        FROM q),
      t0 AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+')
                 AS toks
        FROM documents),
      base AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
               CAST(len(list_distinct(toks)) AS BIGINT) AS du,
               unnest(toks) AS token
        FROM t0),
      tf AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf,
               min(dl) AS dl, min(du) AS du
        FROM base WHERE token IN (SELECT token FROM qt)
        GROUP BY 1, 2),
      dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
                FROM tf GROUP BY 1),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      rel AS (
        SELECT query_id, doc_id, sum(tf * ($idfSql)) AS rel,
               min((1000 * du) // dl) AS uniq
        FROM tf JOIN qt USING (token) JOIN dfreq USING (token), n
        GROUP BY 1, 2),
      rl AS (
        SELECT query_id, doc_id, r_rel FROM (
          SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY rel DESC, doc_id) AS r_rel
          FROM rel) WHERE r_rel <= 100),
      ql AS (
        SELECT query_id, doc_id, r_q FROM (
          SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY uniq DESC, doc_id) AS r_q
          FROM rel) WHERE r_q <= 100),
      f AS (
        SELECT coalesce(rl.query_id, ql.query_id) AS query_id,
               coalesce(rl.doc_id, ql.doc_id) AS doc_id,
               coalesce(1000000 // (60 + r_rel), 0)
                 + coalesce(1000000 // (60 + r_q), 0) AS fused
        FROM rl FULL OUTER JOIN ql
          ON rl.query_id = ql.query_id AND rl.doc_id = ql.doc_id)
      SELECT query_id, rnk, doc_id, CAST(fused AS BIGINT) AS fused FROM (
        SELECT query_id, doc_id, fused,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY fused DESC, doc_id) AS BIGINT) AS rnk
        FROM f) WHERE rnk <= 10
      ORDER BY query_id, rnk"""))

  private val BpeIters = 3

  /** t_bpe_train — the FULL BPE training loop for [[BpeIters]] merge
    * iterations (Sennrich et al. 2016, the algorithm behind GPT-2/HF
    * tokenizer training): each round counts adjacent symbol pairs over
    * the weighted VOCABULARY (never the corpus — see [[wordCounts]]),
    * adopts the most frequent pair as a new symbol (greedy,
    * left-to-right non-overlapping application = SQL `replace`), and
    * re-encodes the vocabulary before the next round. Output is the
    * learned merge table: (step, merged pair with earlier merges
    * rendered as `<...>`, selection-time count) — merge i's marker
    * symbol is char(i), so later merges can and do build on earlier
    * ones exactly as in real BPE.
    *
    * Scale shape: the corpus collapses to (word, count) ONCE; every
    * iteration after that is vocabulary-sized — one pair-explode +
    * keyed aggregate, a 1-row broadcast of the winning pair, one
    * map-side re-encode, and a localCheckpoint that keeps the iterated
    * plan shallow (the same lineage-cut discipline as
    * [[Graph.pagerank]]). A 50k-merge production run is this exact
    * loop with the merge table accumulating driver-side KBs.
    *
    * The oracle replays every round: same pair counts, same
    * (count desc, pair) tie-break, same greedy replace — the learned
    * merge table must match choice-for-choice. */
  /** The BPE training loop as a library entry point: `wc` is a
    * (w, wn) weighted vocabulary ([[wordCounts]] for a corpus);
    * returns the learned merge table (step, pair, n_occ) for `iters`
    * greedy merges, earlier merges rendered inside later ones as
    * `<...>`. Merge i's marker symbol is char(i) — callers wanting
    * more than ~31 merges should widen the marker alphabet (markers
    * must stay out of the vocabulary's own characters). Returns fewer
    * than `iters` rows only if the vocabulary exhausts (every word
    * collapses below 2 symbols) — the cross-joined empty top-1
    * empties the output rather than fabricating merges. */
  /** The raw learned merge table as ONE row (mp1, n1, …, mpI, nI) in
    * marker form — merge i's pair may contain the char(j) markers of
    * earlier merges (j < i). This is the form [[bpeEncode]] applies
    * (the replace chain needs markers, not the rendered `<...>`
    * display) and [[bpeTrain]] renders for humans. One row → always
    * broadcast; the loop body is vocabulary-sized per round. */
  def bpeRawMerges(wc: org.apache.spark.sql.DataFrame,
      iters: Int = BpeIters): DataFrame = {
    require(iters >= 1 && iters <= 31,
      s"graft: bpeTrain iters must be in [1, 31], got $iters")
    def pairCounts(df: org.apache.spark.sql.DataFrame) = df
      .select(col("wn"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("wn")).as("n_occ"))
    var vocab = wc.select(col("w"), col("wn")).localCheckpoint(eager = true)
    var merges: org.apache.spark.sql.DataFrame = null
    for (i <- 1 to iters) {
      val top1 = pairCounts(vocab)
        .orderBy(col("n_occ").desc, col("pair")).limit(1)
        .select(col("pair").as(s"mp$i"), col("n_occ").as(s"n$i"))
      merges = if (merges == null) top1 else merges.crossJoin(broadcast(top1))
      vocab = vocab.crossJoin(broadcast(top1.select(col(s"mp$i"))))
        .select(expr(s"replace(w, mp$i, char($i))").as("w"), col("wn"))
        .filter(length(col("w")) >= 2)
        .groupBy(col("w")).agg(sum(col("wn")).as("wn"))
        .localCheckpoint(eager = true)
    }
    merges
  }

  /** Encode a document corpus with a learned merge table
    * ([[bpeRawMerges]]): per word, the merges apply in TRAINING ORDER
    * as a greedy left-to-right non-overlapping replace chain — real
    * BPE application, so a word the training saw collapses to exactly
    * the symbols training left it with. Returns per-document
    * (n_words, sym_before, sym_after, saved_pct): the
    * tokenizer-compression profile (saved_pct ≈ how much of the doc
    * is built from the corpus's dominant fragments — low savings =
    * unusual/noisy text, another curation signal).
    *
    * Scale shape: the 1-row merge table broadcasts; the encode is a
    * single zero-shuffle projection — filter/transform/aggregate
    * higher-order functions over the token array, all codegen'd, no
    * explode, no per-doc aggregation exchange. Empty-token filtering
    * matches the tokenization contract; docs with no symbols are
    * dropped (a 0-symbol doc has no ratio). */
  def bpeEncode(docs: org.apache.spark.sql.DataFrame,
      wc: org.apache.spark.sql.DataFrame,
      iters: Int = BpeIters): DataFrame = {
    val raw = bpeRawMerges(wc, iters)
    val chain = (1 to iters).foldLeft("x") { (acc, i) =>
      s"replace($acc, mp$i, char($i))"
    }
    docs.select(col("doc_id"), TF.tokens(col("text")).as("ts"))
      .crossJoin(broadcast(raw.select((1 to iters).map(i => col(s"mp$i")): _*)))
      .select(col("doc_id"),
        expr("size(filter(ts, x -> x <> ''))").cast("long").as("n_words"),
        expr("aggregate(filter(ts, x -> x <> ''), 0L, " +
          "(a, x) -> a + length(x))").as("sym_before"),
        expr("aggregate(filter(ts, x -> x <> ''), 0L, " +
          s"(a, x) -> a + length($chain))").as("sym_after"))
      .filter(col("sym_before") > 0)
      .withColumn("saved_pct",
        expr("(100 * (sym_before - sym_after)) div sym_before"))
      .orderBy(col("doc_id"))
  }

  def bpeTrain(wc: org.apache.spark.sql.DataFrame,
      iters: Int = BpeIters): DataFrame = {
    val merges = bpeRawMerges(wc, iters)
    // rendered form r_i: mp_i with every earlier marker expanded,
    // innermost-first (char(i-1) ... char(1)) — markers only ever
    // reference EARLIER merges, so ascending construction terminates
    var m = merges
    for (i <- 1 to iters) {
      val rendered = (i - 1 to 1 by -1).foldLeft(s"mp$i") { (acc, j) =>
        s"replace($acc, char($j), concat('<', r$j, '>'))"
      }
      m = m.withColumn(s"r$i", expr(rendered))
    }
    m.select(explode(array((1 to iters).map(i =>
        struct(lit(i.toLong).as("step"), col(s"r$i").as("pair"),
          col(s"n$i").as("n_occ"))): _*)).as("m"))
      .select(col("m.step").as("step"), col("m.pair").as("pair"),
        col("m.n_occ").as("n_occ"))
      .orderBy(col("step"))
  }

  /** Oracle CTE stages replaying the training loop: per round the
    * pair counts (p_i), the winning merge (t_i), and the re-encoded
    * vocabulary (v_i) — shared by the train and encode oracles. */
  private def bpeStagesSql(iters: Int): String =
    (1 to iters).map { i =>
      s"""p$i AS (
        SELECT wn, unnest([substring(w, CAST(x AS INT), 2)
                           for x in range(1, length(w))]) AS pair
        FROM v${i - 1}),
      t$i AS (
        SELECT pair AS mp, CAST(sum(wn) AS BIGINT) AS n
        FROM p$i GROUP BY pair ORDER BY n DESC, mp LIMIT 1),
      v$i AS (
        SELECT w, CAST(sum(wn) AS BIGINT) AS wn FROM (
          SELECT replace(v.w, t.mp, chr($i)) AS w, v.wn
          FROM v${i - 1} v, t$i t) WHERE length(w) >= 2 GROUP BY w)"""
    }.mkString(",\n      ")

  /** t_bpe_encode — ENCODE the corpus with the trained merge table:
    * per document, every word runs the marker-form replace chain in
    * training order ([[bpeEncode]]); output is the per-doc
    * (n_words, sym_before, sym_after, saved_pct) compression profile.
    * The oracle re-trains the identical merges (the shared stage CTEs)
    * and replays the chain per word. */
  val tBpeEncode: QueryDef = QueryDef(
    fn = (s, dir) =>
      bpeEncode(Tables.load(s, dir, "documents"), wordCounts(s, dir),
        BpeIters),
    oracle = Some {
      val chain = (1 to BpeIters).foldLeft("x") { (acc, i) =>
        s"replace($acc, t$i.mp, chr($i))"
      }
      s"""
      WITH $wordCountsSql,
      v0 AS (SELECT w, wn FROM wc),
      ${bpeStagesSql(BpeIters)},
      toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                 x -> x <> '') AS ts
        FROM documents),
      enc AS (
        SELECT doc_id,
               CAST(len(ts) AS BIGINT) AS n_words,
               CAST(coalesce(list_sum([length(x) for x in ts]), 0)
                 AS BIGINT) AS sym_before,
               CAST(coalesce(list_sum([length($chain) for x in ts]), 0)
                 AS BIGINT) AS sym_after
        FROM toks, t1, t2, t3)
      SELECT doc_id, n_words, sym_before, sym_after,
             (100 * (sym_before - sym_after)) // sym_before AS saved_pct
      FROM enc WHERE sym_before > 0
      ORDER BY doc_id"""
    })

  val tBpeTrain: QueryDef = QueryDef(
    fn = (s, dir) => bpeTrain(wordCounts(s, dir), BpeIters),
    oracle = Some {
      val stages = bpeStagesSql(BpeIters)
      s"""
      WITH $wordCountsSql,
      v0 AS (SELECT w, wn FROM wc),
      $stages,
      rr AS (
        SELECT t1.mp AS r1,
               replace(t2.mp, chr(1), '<' || t1.mp || '>') AS r2,
               replace(replace(t3.mp, chr(2),
                 '<' || replace(t2.mp, chr(1), '<' || t1.mp || '>') || '>'),
                 chr(1), '<' || t1.mp || '>') AS r3,
               t1.n AS n1, t2.n AS n2, t3.n AS n3
        FROM t1, t2, t3)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS step, r1 AS pair, n1 AS n_occ FROM rr
        UNION ALL SELECT 2, r2, n2 FROM rr
        UNION ALL SELECT 3, r3, n3 FROM rr)
      ORDER BY step"""
    })

  val defs: Map[String, QueryDef] = Map(
    "t_rrf" -> tRrf,
    "t_tfidf" -> tTfidf,
    "t_bm25" -> tBm25,
    "t_retrieval_eval" -> tRetrievalEval,
    "t_hybrid_search" -> tHybridSearch,
    "t_dsir" -> tDsir,
    "t_bpe_pairs" -> tBpePairs,
    "t_bpe_merge" -> tBpeMerge,
    "t_bpe_train" -> tBpeTrain,
    "t_bpe_encode" -> tBpeEncode)
}
