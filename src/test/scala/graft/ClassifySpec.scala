package graft

import graft.operators.Selection
import org.apache.spark.sql.DataFrame

/** Naive Bayes quality classifier ([[Selection.nbScores]]): the
  * integer LLR algebra asserted on constructed corpora where every
  * floor cell is hand-computable — class evidence drives the sign,
  * symmetric evidence scores exactly zero, add-one smoothing keeps
  * single-class tokens finite. */
class ClassifySpec extends SparkSpec {

  private def docsOf(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  /** (doc_id, n_tokens, llr4_sum, keep). */
  private def scores(df: DataFrame): Map[Long, (Long, Long, Long)] =
    Selection.nbScores(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("class evidence drives sign: seed-heavy tokens keep, crawl-heavy drop") {
    // cls(good): cp=2 cn=1; cls(bad): cp=1 cn=2; np=nn=3, v=2
    // llr4(good) = floor(ln(3/5)e4) - floor(ln(2/5)e4) = -5109+9163 = 4054
    val out = scores(docsOf(
      (1L, "src0", "good good"),
      (2L, "src9", "bad bad"),
      (3L, "src9", "good"),
      (4L, "src0", "bad")))
    assert(out(1L) === ((2L, 8108L, 1L)))
    assert(out(2L) === ((2L, -8108L, 0L)))
    // the classifier scores the TEXT, not the source: a crawl doc made
    // of seed-like tokens keeps, a seed doc of crawl-like tokens drops
    assert(out(3L) === ((1L, 4054L, 1L)))
    assert(out(4L) === ((1L, -4054L, 0L)))
  }

  test("symmetric evidence scores exactly zero and does not keep") {
    // cls(x): cp=1 cn=1; np=nn=1, v=1 -> llr4 = 0 - 0 = 0; keep needs > 0
    val out = scores(docsOf((1L, "src0", "x"), (2L, "src9", "x")))
    assert(out(1L) === ((1L, 0L, 0L)))
    assert(out(2L) === ((1L, 0L, 0L)))
  }

  test("add-one smoothing keeps single-class tokens finite and sign-correct") {
    // cls(only): cp=1 cn=0; cls(other): cp=0 cn=1; np=nn=1, v=2
    // llr4(only) = floor(ln(2/3)e4) - floor(ln(1/3)e4) = -4055+10987 = 6932
    val out = scores(docsOf((1L, "src0", "only"), (2L, "src9", "other")))
    assert(out(1L) === ((1L, 6932L, 1L)))
    assert(out(2L) === ((1L, -6932L, 0L)))
  }

  // --- the stored model: serve-online scoring + incremental retrain ---

  // base: cls(good)=(2,0), cls(bad)=(0,1); np=2 nn=1 v=2
  // llr4(good) = floor(ln(3/4)e4) - floor(ln(1/3)e4) = -2877+10987 =  8110
  // unseen4    = floor(ln(1/4)e4) - floor(ln(1/3)e4) = -13863+10987 = -2876
  private def baseDocs = docsOf((1L, "src0", "good good"), (2L, "src9", "bad"))

  private def freshClsBase(): String = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_scls_spec"
    deleteRecursively(new java.io.File(base))
    Selection.classifySeed(base, baseDocs)
    base
  }

  private def ledger(base: String, b: Long): Map[Long, (Long, Long, Long)] =
    spark.read.parquet(s"$base/ledger/x$b").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("stored model scores arrivals; unseen tokens get the stored constant") {
    val base = freshClsBase()
    Selection.classifyBatch(spark, base, docsOf(
      (100L, "srcX", "novel"),       // OOV -> unseen4 = -2876, drop
      (101L, "srcX", "good"),        // 8110, keep
      (102L, "srcX", "good novel")), // 8110 - 2876 = 5234, keep
      b = 0L)
    val out = ledger(base, 0L)
    assert(out(100L) === ((1L, -2876L, 0L)))
    assert(out(101L) === ((1L, 8110L, 1L)))
    assert(out(102L) === ((2L, 5234L, 1L)))
  }

  test("redelivery replays identical decisions (static model)") {
    val base = freshClsBase()
    val batch = docsOf((100L, "srcX", "good novel"))
    Selection.classifyBatch(spark, base, batch, b = 0L)
    val first = ledger(base, 0L)
    Selection.classifyBatch(spark, base, batch, b = 0L)
    assert(ledger(base, 0L) === first)
  }

  test("delta-merged counts retrain to the identical model as from-scratch") {
    import org.apache.spark.sql.functions._
    val all = docsOf((1L, "src0", "good good"), (2L, "src9", "bad"),
      (3L, "src9", "good new"), (4L, "src0", "bad new"))
    val base = docsOf((1L, "src0", "good good"), (2L, "src9", "bad"))
    val delta = docsOf((3L, "src9", "good new"), (4L, "src0", "bad new"))
    val merged = Selection.nbCounts(base)
      .unionByName(Selection.nbCounts(delta))
      .groupBy(col("w")).agg(sum(col("cp")).as("cp"), sum(col("cn")).as("cn"))
    val inc = Selection.nbLlr4(merged).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val full = Selection.nbLlr4(Selection.nbCounts(all)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(inc === full)
  }
}
