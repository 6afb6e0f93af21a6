package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed global running totals.
  *
  * `sum(x) OVER (ORDER BY k)` with no PARTITION BY plans a single-
  * partition window — the whole dataset funnels through one task. This
  * operator computes the same inclusive running sum with scale-safe
  * parallelism: range-repartition by the ordering key, slice-local
  * cumsums (parallel across slices), then add each slice's broadcast
  * offset (total of all earlier slices — #slices rows).
  *
  * The ordering key must be unique per row (ties split across range
  * boundaries would make the inclusive sum order-dependent).
  *
  * Cost note: the slice-local window re-shuffles by `_pid` because
  * Catalyst cannot prove the range exchange already clustered rows by
  * partition id — two linear, fully-parallel exchanges of the data
  * instead of one. Still a different complexity class from the global
  * `ORDER BY` window's single-task funnel this replaces.
  */
object PrefixSum {

  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String): DataFrame = {
    val parts = df.repartitionByRange(col(orderCol))
      .withColumn("_pid", spark_partition_id())
    val wSlice = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
    val local = parts.withColumn("_lsum", sum(col(valueCol)).over(wSlice))
    val totals = parts.groupBy(col("_pid")).agg(sum(col(valueCol)).as("_pt"))
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the offset table is #slices rows — the single-partition window
    // here is over that tiny table, not the data
    val offsets = totals
      .withColumn("_off", coalesce(sum(col("_pt")).over(wOff), lit(0L)))
      .drop("_pt")
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn(outCol, col("_lsum") + col("_off"))
      .drop("_pid", "_lsum", "_off")
  }
}
