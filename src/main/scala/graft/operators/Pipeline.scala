package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{TextFunctions => TF}
import graft.plans.RollingFingerprint
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Training-data pipeline queries (SURVEY.md §2 block D): dedup,
  * similarity search, text analysis, multimodal plumbing — the
  * beyond-the-reference surface for 100 TB curation jobs.
  *
  * Text-analysis oracles are generated from the same marker tables the
  * Spark expressions use, so both sides are definitionally in sync.
  */
object Pipeline {

  // ---- oracle SQL generators (DuckDB dialect) ----

  /** padded-replace occurrence count of `m` in lower(text). */
  private def occSql(m: String): String =
    s"CAST((length(' ' || lower(text) || ' ') - " +
      s"length(replace(' ' || lower(text) || ' ', '$m', ''))) / ${m.length} AS BIGINT)"

  private def scoreSql(lang: String): String =
    TF.langMarkers.toMap.apply(lang).map(occSql).mkString("(", " + ", ")")

  private val langCaseSql: String = {
    val s = TF.langMarkers.map(_._1).map(l => l -> scoreSql(l)).toMap
    s"""CASE
       WHEN ${s("en")} >= ${s("de")} AND ${s("en")} >= ${s("fr")} AND ${s("en")} >= ${s("es")} AND ${s("en")} > 0 THEN 'en'
       WHEN ${s("de")} >= ${s("fr")} AND ${s("de")} >= ${s("es")} AND ${s("de")} > 0 THEN 'de'
       WHEN ${s("fr")} >= ${s("es")} AND ${s("fr")} > 0 THEN 'fr'
       WHEN ${s("es")} > 0 THEN 'es'
       ELSE 'und' END"""
  }

  private val stopCountSql: String =
    TF.enStopwords.map(occSql).mkString("(", " + ", ")")

  // ---- text analysis ----

  val tLangid: QueryDef = QueryDef(
    fn = (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TF.langScore(col("text"), "en").as("s_en"),
          TF.langScore(col("text"), "de").as("s_de"),
          TF.langScore(col("text"), "fr").as("s_fr"),
          TF.langScore(col("text"), "es").as("s_es"),
          TF.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id")),
    oracle = Some(s"""
      SELECT doc_id,
             ${scoreSql("en")} AS s_en,
             ${scoreSql("de")} AS s_de,
             ${scoreSql("fr")} AS s_fr,
             ${scoreSql("es")} AS s_es,
             $langCaseSql AS lang_pred
      FROM documents
      ORDER BY doc_id"""))

  val tQuality: QueryDef = QueryDef(
    fn = (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_calc"),
          TF.tokenCountWs(col("text")).as("n_tokens"),
          TF.avgTokenLen(col("text")).as("avg_tok_len"),
          TF.stopwordCount(col("text")).as("n_stopwords"),
          TF.alphaRatio(col("text")).as("alpha_ratio"),
          TF.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id")),
    oracle = Some(s"""
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars_calc,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
             floor(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                   / len(regexp_split_to_array(trim(text), '\\s+')) * 10000) / 10000 AS avg_tok_len,
             $stopCountSql AS n_stopwords,
             floor(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                   / length(text) * 10000) / 10000 AS alpha_ratio,
             floor((0.4 * least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 64.0, 1.0)
                 + 0.3 * least((CAST($stopCountSql AS DOUBLE)
                                / len(regexp_split_to_array(trim(text), '\\s+'))) * 4, 1.0)
                 + 0.3 * (floor(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                               / length(text) * 10000) / 10000)) * 10000) / 10000 AS quality
      FROM documents
      ORDER BY doc_id"""))

  val tTokens: QueryDef = QueryDef(
    fn = (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TF.tokenCountWs(col("text")).as("n_ws"),
          TF.tokenCountBpe(col("text")).as("n_bpe"))
        .orderBy(col("doc_id")),
    oracle = Some(s"""
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_ws,
             CAST(len(regexp_extract_all(text, '${TF.bpePattern}')) AS BIGINT) AS n_bpe
      FROM documents
      ORDER BY doc_id"""))

  /** PII-style scrub: mask email-shaped tokens and digit runs — the
    * redaction pass a training-data pipeline runs before tokenizing.
    * Pure regexp_replace (codegen'd), identical regex both engines. */
  val tRedact: QueryDef = QueryDef(
    fn = (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          regexp_replace(
            regexp_replace(col("text"),
              "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
            "[0-9]+", "#").as("redacted"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "[0-9]", ""))).cast("long")
            .as("n_digits"))
        .orderBy(col("doc_id")),
    oracle = Some("""
      SELECT doc_id,
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '[0-9]+', '#', 'g') AS redacted,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
               AS n_digits
      FROM documents
      ORDER BY doc_id"""))

  val tFingerprint: QueryDef = QueryDef(
    fn = (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          Bridge.column(RollingFingerprint(
            Bridge.expression(lower(col("text"))), 16)).as("fp"))
        .orderBy(col("doc_id")),
    oracle = None)

  // ---- dedup ----

  val dDedupExact: QueryDef = QueryDef(
    fn = (s, dir) =>
      Dedup.exact(Tables.load(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id")),
    oracle = Some("""
      SELECT doc_id, md5(text) AS content_hash,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1 AS is_dup
      FROM documents
      ORDER BY doc_id"""))

  val dDedupMinhash: QueryDef = QueryDef(
    fn = (s, dir) =>
      Dedup.minhashPairs(Tables.load(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("id_a"), col("id_b")),
    oracle = None)

  val dDedupSimhash: QueryDef = QueryDef(
    fn = (s, dir) =>
      Dedup.simhashPairs(Tables.load(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("id_a"), col("id_b")),
    oracle = None)

  val dDedupNgram: QueryDef = QueryDef(
    fn = (s, dir) =>
      Dedup.ngramJaccardPairs(Tables.load(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("id_a"), col("id_b")),
    oracle = None)

  /** Near-dup clusters: connected components over the MinHash pair
    * list; one canonical keeper per cluster. */
  val dDedupClusters: QueryDef = QueryDef(
    fn = (s, dir) =>
      Dedup.clusters(
        Dedup.minhashPairs(Tables.load(s, dir, "documents"), "text", "doc_id"))
        .orderBy(col("id")),
    oracle = None)

  val dDedupEmbed: QueryDef = QueryDef(
    fn = (s, dir) =>
      Dedup.embeddingPairs(Tables.load(s, dir, "embeddings"), "embedding", "vec_id")
        .orderBy(col("id_a"), col("id_b")),
    oracle = None)

  // ---- similarity search ----

  val dAnnBrute: QueryDef = QueryDef(
    fn = (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 10), "embedding", "vec_id")
    },
    oracle = None)

  val dAnnIvf: QueryDef = QueryDef(
    fn = (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), "embedding", "vec_id")
    },
    oracle = None)

  val dAnnLsh: QueryDef = QueryDef(
    fn = (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), "embedding", "vec_id")
    },
    oracle = None)

  // ---- multimodal ----

  val mModalMeta: QueryDef = QueryDef(
    fn = (s, dir) =>
      Multimodal.decodeMedia(s, Multimodal.fakeMediaTable(s, dir))
        .toDF()
        .orderBy(col("doc_id")),
    oracle = None)

  val mModalResize: QueryDef = QueryDef(
    fn = (s, dir) =>
      Multimodal.resizeMedia(s, Multimodal.fakeMediaTable(s, dir))
        .toDF()
        .orderBy(col("doc_id")),
    oracle = None)

  val mModalFrames: QueryDef = QueryDef(
    fn = (s, dir) =>
      Multimodal.sampleFrames(s, Multimodal.fakeMediaTable(s, dir))
        .toDF()
        .orderBy(col("doc_id")),
    oracle = None)

  val defs: Map[String, QueryDef] = Map(
    "t_langid" -> tLangid,
    "t_quality" -> tQuality,
    "t_tokens" -> tTokens,
    "t_fingerprint" -> tFingerprint,
    "t_redact" -> tRedact,
    "d_dedup_exact" -> dDedupExact,
    "d_dedup_minhash" -> dDedupMinhash,
    "d_dedup_simhash" -> dDedupSimhash,
    "d_dedup_ngram" -> dDedupNgram,
    "d_dedup_clusters" -> dDedupClusters,
    "d_dedup_embed" -> dDedupEmbed,
    "d_ann_brute" -> dAnnBrute,
    "d_ann_lsh" -> dAnnLsh,
    "d_ann_ivf" -> dAnnIvf,
    "m_modal_meta" -> mModalMeta,
    "m_modal_resize" -> mModalResize,
    "m_modal_frames" -> mModalFrames)
}
