package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** WINNOWING document fingerprints (Schleimer, Wilkerson, Aiken —
  * SIGMOD 2003, the MOSS algorithm): hash every k-gram, slide a
  * window of w consecutive hashes, keep the minimum of each window
  * (rightmost on ties — "robust winnowing"). The selected set is a
  * position-independent fingerprint with two guarantees the paper
  * proves: any shared run of w+k-1 tokens yields at least one shared
  * fingerprint (detection), and no run shorter than k is ever matched
  * (noise floor); expected density is 2/(w+1).
  *
  * This is the third fingerprinting scheme in the engine and fills a
  * real gap: t_fingerprint's rolling hashes fingerprint EVERY k-gram
  * (storage-linear in tokens), the CDC chunker cuts at content-defined
  * boundaries for chunk-level storage dedup — winnowing is the
  * sub-linear LOCAL-sampling scheme whose selection is stable under
  * insertions (an edit perturbs only the windows it touches, so
  * distant fingerprints survive — the property MOSS plagiarism
  * detection runs on).
  *
  * Cross-engine exactness: gram hash = first 8 hex digits of md5,
  * decoded by an 8-term positional sum (the [[Selection]] device —
  * DuckDB has no conv(), Spark no from_hex; both dialects are
  * generated from ONE loop below so they cannot drift). Window
  * argmin-with-rightmost-ties is packed into a single BIGINT
  * `hash·2²⁰ + (2²⁰−1−pos)` so ONE integer `min` implements the tie
  * rule identically in both engines; positions ≥ 2²⁰ would corrupt
  * the packing, so the plan raises loudly on any ≥1M-token document
  * (raise_error, the q_item_sim overflow discipline) instead of
  * fingerprinting it wrong.
  *
  * Scale shape: gram hashing and window selection are token-linear
  * and partition by doc_id — the only unbounded-width relation,
  * (doc, pos), never shuffles except INTO that per-doc window, and a
  * window partition is bounded by document length, not corpus size.
  * The pair-matching leg joins docs on fingerprint hash with a
  * document-frequency cap ([[WinnowDfCap]]) exactly like the
  * containment/window-dedup postings joins — a boilerplate
  * fingerprint shared by thousands of docs is dropped BEFORE the
  * join, so candidate generation is Σ df² over capped dfs.
  */
object Winnow {

  /** k-gram size in tokens. */
  private val K = 3

  /** Winnowing window: w consecutive k-gram hashes. */
  private val W = 4

  /** Pair-matching document-frequency cap: fingerprints in more docs
    * are boilerplate and leave before the candidate join. */
  private val WinnowDfCap = 20

  /** Pairs must share at least this many capped fingerprints
    * (calibrated: 24 of the 25 planted near-dup pairs at sf0.01 —
    * one planted pair shares only 3 — 240 pairs at sf0.1, against
    * 103/414 at a threshold of 3 where background chance-collisions
    * of the tiny synthetic vocabulary enter). */
  private val SharedFloor = 4

  /** Position packing width: pos rides the low 20 bits of the
    * selection key, so documents must stay under 2²⁰ tokens. */
  private val PosBits = 20
  private val PosCap = 1L << PosBits // 1,048,576

  // one loop generates both dialects of the 32-bit hex decode —
  // the Selection.scala device, kept local so the module is
  // self-contained (the helpers there are private by design).
  private def hexToLongSpark(h: String): String =
    (1 to 8).map(i =>
      s"(locate(substring($h, $i, 1), '0123456789abcdef') - 1) * " +
        s"${1L << (4 * (8 - i))}L")
      .mkString("(", " + ", ")")
  private def hexToLongDuck(h: String): String =
    (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', substring($h, $i, 1)) - 1) * " +
        s"CAST(${1L << (4 * (8 - i))} AS BIGINT)")
      .mkString("(", " + ", ")")

  /** Distinct winnowed fingerprints per document:
    * (doc_id, m = n_grams, fh = 32-bit gram hash, fpos = selected
    * gram position). Shared by both queries below. */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    fingerprintsOf(Tables.load(s, dir, "documents"))

  /** [[fingerprints]] over any (doc_id, text) relation — the library
    * entry point (and the spec seam for the paper's guarantees). */
  def fingerprintsOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .withColumn("t",
        when(size(col("t")) >= PosCap.toInt,
          raise_error(concat(
            lit("graft winnow: document "), col("doc_id").cast("string"),
            lit(s" has >= $PosCap tokens - position packing would corrupt"))))
          .otherwise(col("t")))
      .withColumn("m", (size(col("t")) - (K - 1)).cast("long"))
      .filter(col("m") >= W) // shorter docs have no complete window
    val grams = toks.select(col("doc_id"), col("m"),
      posexplode(expr(
        s"""transform(sequence(1, cast(m as int)),
              i -> substring(md5(concat_ws(' ',
                     element_at(t, i), element_at(t, i+1), element_at(t, i+2))),
                   1, 8))""")))
      .select(col("doc_id"), col("m"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("h8"))
    val keyed = grams.withColumn("key",
      expr(s"${hexToLongSpark("h8")} * $PosCap + ($PosCap - 1 - p)"))
    val wSel = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(Window.currentRow, W - 1)
    keyed
      .withColumn("skey", min(col("key")).over(wSel))
      .filter(col("p") <= col("m") - (W - 1)) // only complete windows
      .select(col("doc_id"), col("m"),
        expr(s"skey div $PosCap").as("fh"),
        expr(s"$PosCap - 1 - (skey % $PosCap)").as("fpos"))
      .distinct()
  }

  /** Shared oracle CTEs mirroring [[fingerprints]] (DuckDB dialect). */
  private val fingerprintsSql: String = s"""toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents),
      grams AS (
        SELECT doc_id, i AS p, len(t) - ${K - 1} AS m,
               substring(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 8) AS h8
        FROM toks, unnest(generate_series(1, len(t) - ${K - 1})) AS u(i)
        WHERE len(t) - ${K - 1} >= $W),
      keyed AS (
        SELECT doc_id, p, m,
               ${hexToLongDuck("h8")} * $PosCap + ($PosCap - 1 - p) AS key
        FROM grams),
      sel AS (
        SELECT doc_id, m, p,
               min(key) OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS skey
        FROM keyed),
      fp AS (
        SELECT DISTINCT doc_id, m, skey // $PosCap AS fh,
               $PosCap - 1 - (skey % $PosCap) AS fpos
        FROM sel WHERE p <= m - ${W - 1})"""

  /** t_winnow — per-document winnowing fingerprint profile: gram and
    * window counts, selected fingerprints (distinct positions and
    * distinct hashes), and density in per-mille — the paper's 2/(w+1)
    * expectation (400‰ at w=4) is directly visible in the output
    * (corpus mean ≈ 416‰ at sf0.01). All counts integer. */
  val tWinnow: QueryDef = QueryDef(
    fn = (s, dir) =>
      fingerprints(s, dir)
        .groupBy(col("doc_id"))
        .agg(max(col("m")).as("n_grams"),
          (max(col("m")) - (W - 1)).as("n_windows"),
          count(lit(1)).as("n_fp"),
          countDistinct(col("fh")).as("n_fp_hash"))
        .withColumn("density_pm",
          expr("1000 * n_fp div n_windows"))
        .orderBy(col("doc_id")),
    oracle = Some(s"""
      WITH $fingerprintsSql
      SELECT doc_id, max(m) AS n_grams, max(m) - ${W - 1} AS n_windows,
             count(*) AS n_fp, count(DISTINCT fh) AS n_fp_hash,
             1000 * count(*) // (max(m) - ${W - 1}) AS density_pm
      FROM fp GROUP BY doc_id ORDER BY doc_id"""))

  /** d_dedup_winnow — MOSS-style near-dup detection on the winnowed
    * fingerprints: document pairs sharing ≥ [[SharedFloor]]
    * fingerprint hashes after the [[WinnowDfCap]] document-frequency
    * cap. Winnowing's guarantee makes this a SUB-LINEAR-storage
    * near-dup family member: only ~2/(w+1) of gram hashes are ever
    * indexed, yet any shared run of w+k−1 = 6 tokens still collides.
    * The df cap bounds the candidate join (Σ df², df ≤ 20) exactly
    * like the containment-postings join. */
  val dDedupWinnow: QueryDef = QueryDef(
    fn = (s, dir) => {
      val fps = fingerprints(s, dir)
        .select(col("doc_id"), col("fh")).distinct()
      val capped = fps.groupBy(col("fh"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= WinnowDfCap)
        .select(col("fh"))
      val rare = fps.join(capped, Seq("fh"), "left_semi")
      rare.as("a")
        .join(rare.as("b"),
          col("a.fh") === col("b.fh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_id"), col("b.doc_id").as("doc_id2"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= SharedFloor)
        .orderBy(col("doc_id"), col("doc_id2"))
    },
    oracle = Some(s"""
      WITH $fingerprintsSql,
      fps AS (SELECT DISTINCT doc_id, fh FROM fp),
      capped AS (
        SELECT fh FROM fps GROUP BY fh HAVING count(*) <= $WinnowDfCap)
      SELECT a.doc_id AS doc_id, b.doc_id AS doc_id2, count(*) AS shared
      FROM fps a
      JOIN fps b ON a.fh = b.fh AND a.doc_id < b.doc_id
      WHERE a.fh IN (SELECT fh FROM capped)
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) >= $SharedFloor
      ORDER BY doc_id, doc_id2"""))

  val defs: Map[String, QueryDef] = Map(
    "t_winnow" -> tWinnow,
    "d_dedup_winnow" -> dDedupWinnow)
}
