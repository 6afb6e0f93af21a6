package graft

import graft.operators.{Pipeline, Relational}
import org.apache.spark.sql.functions._

/** Hand-checkable laws for the wave-3 text signals (entropy, novelty)
  * and monitoring/segmentation queries (CUSUM replay, RFM quintiles). */
class TextSignalsSpec extends SparkSpec {

  test("entropy: constant doc scores 0, uniform doc scores ln(k)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a a a a a"),              // zero entropy
      (2L, "a b c d a b c d"),              // uniform over 4: ln 4
      (3L, "x")                             // single token: 0, ttr 1000
    ).toDF("doc_id", "text")
    val got = Pipeline.entropyOf(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got(0) === ((1L, 8L, 1L, 125L, 0.0)))
    // ln 4 = 1.386294...; per-term q4 = floor(1.3862*1e4) = 13862
    assert(got(1) === ((2L, 8L, 4L, 500L, 1.3862)))
    assert(got(2) === ((3L, 1L, 1L, 1000L, 0.0)))
  }

  test("novelty: a verbatim repeat scores 0, the first occurrence 1000") {
    import spark.implicits._
    val a = "one two three four five six seven"
    val docs = Seq((1L, a), (2L, a), (3L, "p q r s t u v")).toDF("doc_id", "text")
    val got = Pipeline.noveltyOf(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(got === Array((1L, 1000L), (2L, 0L), (3L, 1000L)))
  }

  test("q_cusum equals a plain-Scala replay of the recurrence") {
    val out = Relational.qCusum.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.nonEmpty)
    val byType = out.groupBy(_._1)
    for ((_, rows) <- byType) {
      val sorted = rows.sortBy(_._2)
      val total = sorted.map(_._3).sum
      val m = sorted.length.toLong
      var s = 0L
      for ((_, _, n, cusum, flag) <- sorted) {
        s = math.max(0L, s + m * n - total)
        assert(cusum === s)
        assert(flag === (s > total / 2))
      }
    }
  }

  test("q_rfm: quintile sizes differ by <=1 and follow metric order") {
    val rows = Relational.qRfm.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    for (qi <- Seq(4, 5, 6)) { // r_q, f_q, m_q columns
      val sizes = rows.groupBy(_.getLong(qi)).view.mapValues(_.length).toMap
      assert(sizes.keySet === (1L to 5L).toSet)
      assert(sizes.values.max - sizes.values.min <= 1,
        s"unbalanced quintiles: $sizes")
    }
    // recency quintile must be nondecreasing in (last_day, custkey) order
    val byRec = rows.sortBy(r => (r.getLong(1), r.getLong(0))).map(_.getLong(4))
    assert(byRec.zip(byRec.tail).forall { case (a, b) => a <= b })
    // segment code composes the three digits
    for (r <- rows)
      assert(r.getLong(7) ===
        r.getLong(4) * 100 + r.getLong(5) * 10 + r.getLong(6))
  }
}
