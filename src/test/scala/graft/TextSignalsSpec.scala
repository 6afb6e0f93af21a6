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

  test("t_diversity equals a brute Simpson computation") {
    val got = Pipeline.tDiversity.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val docs = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1).view.mapValues { ds =>
      val toks = ds.flatMap(_._2.trim.split("\\s+"))
      val counts = toks.groupBy(identity).values.map(_.length.toLong)
      val n = toks.length.toLong
      val rep = counts.map(c => c * (c - 1)).sum
      (n, counts.size.toLong, 1000000L * rep / (n * (n - 1)))
    }.toMap
    for ((src, n, types, d) <- got)
      assert(bySource(src) === ((n, types, d)), s"mismatch for $src")
  }

  test("q_abc: descending-revenue cumulative shares partition into A/B/C") {
    val rows = Relational.qAbc.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    val byRev = rows.sortBy(r => (-r._2, r._1))
    // cumulative share nondecreasing, ends at exactly 1000 per-mille
    val cums = byRev.map(_._3)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last === 1000L)
    // class assignment consistent with the thresholds
    for ((_, _, cum, cls) <- rows)
      assert(cls === (if (cum <= 800) "A" else if (cum <= 950) "B" else "C"))
    // the A class carries ~80% of revenue and all three classes are
    // populated (the synthetic revenue is flatter than a real Pareto,
    // so no minority-of-parts assertion — that's data, not operator)
    val byCls = rows.groupBy(_._4)
    assert(byCls.keySet === Set("A", "B", "C"))
    assert(byCls("A").map(_._2).sum * 10 >= rows.map(_._2).sum * 7)
  }

  test("q_forecast equals a plain-Scala replay of the SES recurrence") {
    val out = Relational.qForecast.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val cnt = Tables.load(spark, sf, "events")
      .selectExpr("event_type", "(ts div 1000) div 86400000000 as day")
      .groupBy("event_type", "day").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((et, nDays, fc, mae) <- out) {
      val xs = cnt.filter(_._1 == et).sortBy(_._2).map(_._3)
      assert(xs.length.toLong === nDays)
      var s = xs.head * 10
      var err = 0L
      for (x <- xs.tail) {
        err += math.abs(x * 10 - s)
        s = (3 * x * 10 + 7 * s) / 10
      }
      assert(fc === s, s"forecast mismatch for $et")
      assert(mae === err / (nDays - 1), s"mae mismatch for $et")
    }
  }

  test("q_benford: digits from decimal rendering, expected ppm from log10") {
    val rows = Relational.qBenford.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    for ((d, _, share, exp, diff) <- rows) {
      assert(d >= 1 && d <= 9)
      assert(exp ===
        math.floor(math.log10(1.0 + 1.0 / d) * 1000000).toLong)
      assert(diff === share - exp)
    }
    // shares of the digits present sum to ~1e6 (integer-floor slack)
    val total = rows.map(_._3).sum
    assert(total > 1000000L - rows.length && total <= 1000000L)
  }

  test("q_paths equals a brute per-user prefix replay, top-20 with tie-break") {
    val got = Relational.qPaths.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got.length <= 20)
    val ev = Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "ts div 1000000 as ts_ms",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val brute = ev.groupBy(_._1).values
      .map(_.sortBy(e => (e._3, e._2)).take(5).map(_._4).mkString(">"))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got === brute)
  }

  test("q_basket_rules equals a brute basket replay with exact ppm identities") {
    import graft.operators.Graph
    val got = Graph.qBasketRules.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty && got.length <= 20)
    val bought = Tables.load(spark, sf, "lineitem")
      .selectExpr("l_orderkey as o", "l_partkey as p").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = bought.map(_._1).distinct.length.toLong
    val item = bought.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCnt = bought.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((pa, pb, nab, sup, conf, lift) <- got) {
      assert(pairCnt((pa, pb)) === nab)
      assert(sup === 1000000L * nab / n)
      assert(conf === 1000000L * nab / item(pa))
      assert(lift === 1000000L * nab * n / (item(pa) * item(pb)))
      assert(conf >= sup, "confidence below support is impossible")
    }
    val lifts = got.map(_._6)
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("q_histogram: buckets cover each segment's orders exactly") {
    val rows = Relational.qHistogram.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 9))
    val perSeg = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expect = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSeg === expect)
  }

  test("q_funnel_time equals a brute per-user stage replay") {
    val gotM = Relational.qFunnelTime.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ev = Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_type", "ts div 1000000 as ts_ms")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def firstAfter(u: Long, typ: String, after: Long): Option[Long] =
      byUser(u).filter(e => e._2 == typ && e._3 >= after)
        .map(_._3).minOption
    val vc = byUser.keys.toSeq.flatMap { u =>
      byUser(u).filter(_._2 == "view").map(_._3).minOption.flatMap(tv =>
        firstAfter(u, "click", tv).map(tc => (u, tv, tc)))
    }
    val vcp = vc.flatMap { case (u, tv, tc) =>
      firstAfter(u, "purchase", tc).map(tp => (u, tv, tc, tp)) }
    def stats(deltas: Seq[(Long, Long)]): (Long, Long, Long) = {
      val s = deltas.sortBy(d => (d._2, d._1)).map(_._2)
      val m = s.length
      (m.toLong, s((m + 1) / 2 - 1), s((m * 9 + 9) / 10 - 1))
    }
    assert(gotM("view>click") ===
      stats(vc.map(x => (x._1, (x._3 - x._2) / 60000))))
    assert(gotM("click>purchase") ===
      stats(vcp.map(x => (x._1, (x._4 - x._3) / 60000))))
    assert(gotM("view>purchase") ===
      stats(vcp.map(x => (x._1, (x._4 - x._2) / 60000))))
  }

  test("d_record_link: full coverage at lev<=2, precision >= 0.95 on planted truth") {
    val rows = Pipeline.dRecordLink.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // deletion-neighborhood recall is structural: the dirty name IS a
    // delete-1 variant of its source, so every dirty record must link
    val nDirty = graft.Tables.load(spark, sf, "customer")
      .filter(col("c_custkey") % 3 === 0).count()
    assert(rows.length.toLong === nDirty,
      s"coverage ${rows.length}/$nDirty — blocking lost a dirty record")
    assert(rows.forall(_._3 <= 2), "a dirty record matched only at lev > 2")
    val correct = rows.count { case (dirtyId, matched, _) =>
      matched === dirtyId - 10000000L }
    assert(correct.toDouble / rows.length >= 0.95,
      s"linkage precision ${correct.toDouble / rows.length}")
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
