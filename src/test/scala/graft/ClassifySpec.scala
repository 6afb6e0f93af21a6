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
}
