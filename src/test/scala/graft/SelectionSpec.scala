package graft

import graft.operators.Selection
import graft.plans.{NfcNormalize, TextOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** Selection/normalization operators: kernel semantics, leak-free
  * split property, sampling determinism, boilerplate consistency. */
class SelectionSpec extends SparkSpec {

  test("nfc kernel composes decomposed sequences and is identity on clean text") {
    val decomposed = UTF8String.fromString("café á")
    val composed = TextOps.nfc(decomposed)
    assert(composed.toString === "café á")
    // quick-check fast path: already-NFC input returns the SAME object
    val clean = UTF8String.fromString("plain ascii text")
    assert(TextOps.nfc(clean) eq clean)
    val precomposed = UTF8String.fromString("café")
    assert(TextOps.nfc(precomposed) eq precomposed)
  }

  test("nfc expression stays in whole-stage codegen") {
    // parquet-backed scan: a local relation would be constant-folded
    // into a LocalTableScan with no codegen stage at all
    val df = Tables.load(spark, sf, "documents")
      .select(Bridge.column(NfcNormalize(
        Bridge.expression(concat(lit("a\u0301"), col("text"))))).as("n"))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(plan.contains("WholeStageCodegen subtrees"), plan)
    assert(!plan.contains("Found 0 WholeStageCodegen"), plan)
    val first = df.limit(1).collect()(0).getString(0)
    assert(first.codePointAt(0) == 0xe1, first) // composed to U+00E1
  }

  test("t_normalize: composition shrinks exactly one char per planted pair") {
    val out = Selection.tNormalize.fn(spark, sf).cache()
    // n_raw - n_norm == number of 'a's in the original text (each
    // planted pair composes 2 codepoints -> 1)
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "a", ""))).cast("long")
          .as("n_a"))
    val bad = out.join(docs, "doc_id")
      .filter(col("n_chars_raw") - col("n_chars_norm") =!= col("n_a"))
      .count()
    assert(bad === 0)
    out.unpersist()
    ()
  }

  test("t_weighted_sample: deterministic, size-k, priority-sorted") {
    val a = Selection.tWeightedSample.fn(spark, sf).collect()
    val b = Selection.tWeightedSample.fn(spark, sf).collect()
    assert(a.length === 100)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    val prios = a.map(r => r.getLong(3))
    assert(prios.toSeq === prios.sorted.toSeq)
  }

  test("t_split_leakfree: no cluster - hence no near-dup pair - spans two splits") {
    val out = Selection.tSplitLeakfree.fn(spark, sf).cache()
    val mixed = out.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(mixed === 0)
    // every doc assigned exactly once
    val docs = Tables.load(spark, sf, "documents").count()
    assert(out.count() === docs)
    assert(out.select(col("doc_id")).distinct().count() === docs)
    out.unpersist()
    ()
  }

  test("t_boilerplate: flagged positions never exceed total positions; threshold honored") {
    val out = Selection.tBoilerplate.fn(spark, sf).cache()
    assert(out.filter(col("n_boiler") > col("n_pos")).count() === 0)
    assert(out.filter(col("boiler_ppm") > 1000000L).count() === 0)
    // keep is exactly the ppm predicate
    assert(out.filter(col("keep") =!= (col("boiler_ppm") < 500000L))
      .count() === 0)
    out.unpersist()
    ()
  }

  test("t_gopher: keep is the exact conjunction and counts are consistent") {
    import graft.operators.Selection
    val out = Selection.tGopher.fn(spark, sf).cache()
    assert(out.filter(col("keep") =!= (col("wc_ok") && col("wl_ok")
      && col("sym_ok") && col("alpha_ok") && col("stop_ok"))).count() === 0)
    assert(out.filter(col("n_alpha") > col("n_words")).count() === 0)
    // clean synthetic corpus: everything alphabetic, no symbols
    assert(out.filter(!col("alpha_ok") || !col("sym_ok")).count() === 0)
    out.unpersist()
    ()
  }

  test("t_urlnorm: every noisy spelling of a block collapses to one canonical URL") {
    val out = Selection.tUrlnorm.fn(spark, sf).cache()
    val docs = Tables.load(spark, sf, "documents")
    // partition exactness: group sizes sum to the corpus
    assert(out.agg(sum(col("n_dupes"))).collect()(0).getLong(0)
      === docs.count())
    // group identity: one canonical URL per (source, doc_id div 140)
    // block, so group count == distinct block count
    val blocks = docs
      .select(col("source"), expr("doc_id div 140").as("b"))
      .distinct().count()
    assert(out.count() === blocks)
    // canonical form is actually canonical: lowercase, no tracking
    // params, no fragment, no default port, no www, no trailing slash
    assert(out.filter(
      col("canonical_url") =!= lower(col("canonical_url")) ||
      col("canonical_url").contains("utm_") ||
      col("canonical_url").contains("gclid") ||
      col("canonical_url").contains("fbclid") ||
      col("canonical_url").contains("#") ||
      col("canonical_url").contains(":443") ||
      col("canonical_url").contains("www.") ||
      col("canonical_url").endsWith("/")).count() === 0)
    // keep rule: keep_id is a member of its own group (min doc_id of
    // the block: same source residue, same block index)
    assert(out.filter(expr(
      "canonical_url NOT LIKE concat('%/docs/', CAST(keep_id div 140 AS STRING), '%')"))
      .count() === 0)
    out.unpersist()
    ()
  }

  test("t_line_dedup: within-page repeats and shared boilerplate both removed") {
    val out = Selection.tLineDedup.fn(spark, sf).cache()
    val docs = Tables.load(spark, sf, "documents").count()
    assert(out.count() === docs)
    // pages with the planted repeat have 5 lines in, others 4; kept is
    // always the 2 content chunks (header+footer are corpus-wide
    // boilerplate, the repeat is a within-page duplicate)
    assert(out.filter(col("doc_id") % 3 === 0)
      .filter(col("n_lines_in") =!= 5L).count() === 0)
    assert(out.filter(col("doc_id") % 3 =!= 0)
      .filter(col("n_lines_in") =!= 4L).count() === 0)
    assert(out.filter(col("n_kept") > 2L).count() === 0)
    // the kept text never contains a boilerplate line
    val docsT = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), expr(
        """md5(concat(array_join(slice(split(text, ' '), 1, 8), ' '), '\n',
                      array_join(slice(split(text, ' '), 9, 16 - 8), ' ')))""")
        .as("expect_md5"))
    val joined = out.join(docsT, "doc_id")
    assert(joined.filter(col("n_kept") === 2L)
      .filter(col("kept_md5") =!= col("expect_md5")).count() === 0)
    out.unpersist()
    ()
  }
}
