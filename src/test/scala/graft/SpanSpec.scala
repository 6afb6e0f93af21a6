package graft

import graft.operators.Spans
import org.apache.spark.sql.DataFrame

/** Exact duplicated-span extraction (the ExactSubstr semantics of
  * Lee et al., ACL 2022), asserted on constructed documents where
  * the expected span list is decidable by hand. */
class SpanSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** (doc_id, span_start, span_end, span_tokens, n_windows). */
  private def spans(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    Spans.spansOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("a shared 8-token window yields the exact [1,8] span in both docs") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val out = spans(docsOf(
      1L -> (shared + " " + (1 to 8).map(i => s"a$i").mkString(" ")),
      2L -> (shared + " " + (1 to 8).map(i => s"b$i").mkString(" "))))
    assert(out === Set((1L, 1L, 8L, 8L, 1L), (2L, 1L, 8L, 8L, 1L)))
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // 12 shared tokens -> windows at p=1..5 all duplicated -> one
    // span [1,12] of 5 windows; the distinct suffixes contribute none
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val out = spans(docsOf(
      1L -> (shared + " " + (1 to 8).map(i => s"a$i").mkString(" ")),
      2L -> (shared + " " + (1 to 8).map(i => s"b$i").mkString(" "))))
    assert(out === Set((1L, 1L, 12L, 12L, 5L), (2L, 1L, 12L, 12L, 5L)))
  }

  test("two separated shared runs stay two spans; a 1-token gap keeps them apart") {
    // doc 1: [run1(8)] [gap g1] [run2(8)] — both runs shared with docs
    // 2/3; the single unique gap token must not be bridged
    val r1 = (1 to 8).map(i => s"x$i").mkString(" ")
    val r2 = (1 to 8).map(i => s"y$i").mkString(" ")
    val out = spans(docsOf(
      1L -> s"$r1 g1 $r2",
      2L -> (r1 + " " + (1 to 8).map(i => s"b$i").mkString(" ")),
      3L -> (r2 + " " + (1 to 8).map(i => s"c$i").mkString(" "))))
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1 === Set((1L, 1L, 8L, 8L, 1L), (1L, 10L, 17L, 8L, 1L)))
  }

  test("a within-document repeat is duplication: period-8 doc merges to one full span") {
    // 16 tokens with period 8: windows p=1 and p=9 are the only
    // duplicated ones and abut ([1,8] then [9,16]) -> one span [1,16]
    val half = (1 to 8).map(i => s"r$i").mkString(" ")
    val out = spans(docsOf(1L -> s"$half $half",
      2L -> (1 to 8).map(i => s"z$i").mkString(" ")))
    assert(out === Set((1L, 1L, 16L, 16L, 2L)))
  }

  test("short documents fall back to the whole-doc window, spanning [1, n]") {
    val out = spans(docsOf(1L -> "tiny pair", 2L -> "tiny pair",
      3L -> "other text here"))
    assert(out === Set((1L, 1L, 2L, 2L, 1L), (2L, 1L, 2L, 2L, 1L)))
  }

  test("noise floor: a shared run of 7 tokens (< K) is invisible") {
    val shared = (1 to 7).map(i => s"s$i").mkString(" ")
    val out = spans(docsOf(
      1L -> ((1 to 8).map(i => s"a$i").mkString(" ") + " " + shared),
      2L -> ((1 to 8).map(i => s"b$i").mkString(" ") + " " + shared)))
    assert(out.isEmpty)
  }

  test("clean excises spans, keeps token order; full dups become empty") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val rest = (1 to 8).map(i => s"a$i").mkString(" ")
    val out = Spans.cleanOf(docsOf(
      1L -> (shared + " " + rest),
      2L -> (shared + " " + (1 to 8).map(i => s"b$i").mkString(" ")),
      3L -> "tiny pair", 4L -> "tiny pair",
      5L -> "solo unique tokens only here"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((16L, 8L, rest)))
    assert(out(3L) === ((2L, 0L, "")))
    assert(out(5L) === ((5L, 5L, "solo unique tokens only here")))
  }

  test("decontamination excises benchmark overlap; self-matches never fire") {
    val bench = (1 to 8).map(i => s"q$i").mkString(" ")
    val docs = docsOf(
      1L -> (bench + " " + (1 to 8).map(i => s"x$i").mkString(" ")), // benchmark doc
      10L -> ((1 to 8).map(i => s"a$i").mkString(" ") + " " + bench), // contaminated
      11L -> (1 to 8).map(i => s"u$i").mkString(" "))                 // clean
    val spans = Spans.contaminationSpansOf(docs, benchMaxId = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 10 loses tokens 9-16; doc 1's own window is a self-match
    // (excluded), so the benchmark doc keeps its text
    assert(spans === Set((10L, 9L, 16L)))
  }

  test("two benchmark docs sharing a run decontaminate each other") {
    val shared = (1 to 8).map(i => s"q$i").mkString(" ")
    val docs = docsOf(
      1L -> (shared + " " + (1 to 8).map(i => s"x$i").mkString(" ")),
      2L -> (shared + " " + (1 to 8).map(i => s"y$i").mkString(" ")))
    val spans = Spans.contaminationSpansOf(docs, benchMaxId = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((1L, 1L, 8L), (2L, 1L, 8L)))
  }

  // --- s_dedup_spans batch step: first-seen-wins at span granularity ---

  private def freshSpanBase(baseDocs: DataFrame): String = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_sspan_spec"
    deleteRecursively(new java.io.File(base))
    Spans.spanDedupSeed(base, baseDocs)
    base
  }

  private def ledger(base: String, b: Long): Set[(Long, Long, Long)] =
    spark.read.parquet(s"$base/ledger/x$b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private val run = (1 to 8).map(i => s"s$i").mkString(" ")
  private def novel(tag: String) = (1 to 8).map(i => s"$tag$i").mkString(" ")

  test("streamed arrival carrying base text gets exactly that span; novel text passes") {
    val base = freshSpanBase(docsOf(1L -> (run + " " + novel("b"))))
    Spans.spanDedupBatch(spark, base,
      docsOf(100L -> (novel("a") + " " + run), 101L -> novel("u")), b = 0L)
    assert(ledger(base, 0L) === Set((100L, 9L, 16L)))
  }

  test("a later batch sees an earlier batch's grams; within-batch recurrence is out of scope") {
    val base = freshSpanBase(docsOf(1L -> novel("b")))
    // batch 0: two docs share a novel run — NOT flagged (within-batch)
    Spans.spanDedupBatch(spark, base,
      docsOf(100L -> (novel("x") + " " + novel("w")),
             101L -> (novel("y") + " " + novel("w"))), b = 0L)
    assert(ledger(base, 0L) === Set.empty[(Long, Long, Long)])
    // batch 1: an arrival carrying batch 0's run IS flagged
    Spans.spanDedupBatch(spark, base,
      docsOf(200L -> (novel("w") + " " + novel("z"))), b = 1L)
    assert(ledger(base, 1L) === Set((200L, 1L, 8L)))
  }

  test("redelivery replays the identical ledger link (below-b chain view)") {
    val base = freshSpanBase(docsOf(1L -> run))
    Spans.spanDedupBatch(spark, base, docsOf(100L -> (run + " " + novel("q"))), b = 0L)
    Spans.spanDedupBatch(spark, base, docsOf(200L -> (novel("q") + " " + novel("r"))), b = 1L)
    val first = ledger(base, 0L)
    // redeliver batch 0: batch 1's grams (strictly above) stay invisible,
    // so the link rewrites byte-identically
    Spans.spanDedupBatch(spark, base, docsOf(100L -> (run + " " + novel("q"))), b = 0L)
    assert(ledger(base, 0L) === first)
    assert(first === Set((100L, 1L, 8L)))
    assert(ledger(base, 1L) === Set((200L, 1L, 8L)))
  }

  test("stats cover zero-span docs and the per-mille is exact") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val stats = Spans.spanStatsOf(docsOf(
      1L -> (shared + " t1 t2 t3 t4 t5 t6 t7 t8"), // 16 tokens, 8 dup
      2L -> (shared + " u1 u2 u3 u4 u5 u6 u7 u8"),
      3L -> "all unique tokens in this one here yes"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(stats(1L) === ((16L, 1L, 8L, 500L)))
    assert(stats(3L) === ((8L, 0L, 0L, 0L)))
  }
}
