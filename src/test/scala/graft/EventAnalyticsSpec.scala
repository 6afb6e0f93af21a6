package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Event-log analytics invariants on sf0.001. */
class EventAnalyticsSpec extends SparkSpec {

  test("q_attribution: channels partition the purchase set") {
    val out = Relational.qAttribution.fn(spark, sf).collect()
    val channels = out.map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("click", "view", "direct")), channels)
    val totalPurchases = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(out.map(_.getLong(1)).sum === totalPurchases)
  }

  test("q_spike: med/mad are the true lower medians per type") {
    val out = Relational.qSpike.fn(spark, sf).cache()
    val rows = out.filter(col("event_type") === "click")
      .select(col("n"), col("med"), col("mad")).collect()
    assert(rows.nonEmpty)
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.length + 1) / 2 - 1)
    }
    val ns = rows.map(_.getLong(0)).toSeq
    val med = lowerMedian(ns)
    val mad = lowerMedian(ns.map(n => math.abs(n - med)))
    assert(rows.forall(_.getLong(1) === med))
    assert(rows.forall(_.getLong(2) === mad))
    out.unpersist()
    ()
  }

  test("q_attribution_multi: credits conserve exactly 1000 per purchase") {
    val r = Relational.qAttributionMulti.fn(spark, sf).collect()(0)
    val n = r.getAs[Long]("n_purchases")
    assert(n > 0)
    assert(r.getAs[Long]("milli_total") === n * 1000)
    assert(r.getAs[Long]("click_milli") + r.getAs[Long]("view_milli")
      + r.getAs[Long]("direct_milli") === n * 1000)
  }
}
