package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** The bucketed range join must return exactly the pairs the naive
  * inequality join returns, without planning a nested-loop join. */
class RangeJoinSpec extends SparkSpec {

  private def events = Tables.load(spark, sf, "events")
    .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  private def windows = events.filter(col("event_type") === "error")
    .select(col("event_id").as("window_id"), col("ts").as("t0"),
      (col("ts") + expr("INTERVAL 10 MINUTES")).as("t1"))

  test("bucketed join equals the naive inequality join") {
    val p = events.select(col("event_id"), col("ts"))
    val got = RangeJoin.pointInInterval(p, windows, "ts", "t0", "t1")
      .select(col("window_id"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = p.join(windows, col("ts") >= col("t0") && col("ts") < col("t1"))
      .select(col("window_id"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("no pair is emitted twice (point meets interval in one bucket)") {
    val p = events.select(col("event_id"), col("ts"))
    val dups = RangeJoin.pointInInterval(p, windows, "ts", "t0", "t1")
      .groupBy(col("window_id"), col("event_id")).count()
      .filter(col("count") > 1)
    assert(dups.isEmpty)
  }

  test("bucket-aligned boundaries: end exclusive, empty intervals match nothing") {
    import spark.implicits._
    // points exactly on bucket boundaries (bucketWidth = 600 s)
    val p = Seq(0L, 600L, 1200L, 1800L).toDF("s")
      .select(col("s").as("pid"), timestamp_seconds(col("s")).as("pt"))
    val iv = Seq(
      (1L, 0L, 600L),     // half-open: catches 0, not 600
      (2L, 600L, 600L),   // empty interval: catches nothing
      (3L, 0L, 1800L),    // spans 3 buckets: catches 0, 600, 1200
      (4L, 1799L, 1801L)  // straddles a boundary: catches 1800
    ).toDF("wid", "s0", "s1")
      .select(col("wid"), timestamp_seconds(col("s0")).as("t0"),
        timestamp_seconds(col("s1")).as("t1"))
    val got = RangeJoin.pointInInterval(p, iv, "pt", "t0", "t1")
      .select(col("wid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 0L), (3L, 0L), (3L, 600L), (3L, 1200L), (4L, 1800L)))
  }

  test("plan is an equi-join, not a nested loop or cartesian product") {
    val plan = RangeJoin.pointInInterval(
      events.select(col("event_id"), col("ts")), windows, "ts", "t0", "t1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
