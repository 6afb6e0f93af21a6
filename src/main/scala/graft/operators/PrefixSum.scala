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

  /** Sequence packing WITH oversized-document splitting: documents in
    * `orderCol` order fill fixed `budget`-token packs back to back, and
    * a document longer than the space left in its pack SPLITS across
    * consecutive packs (real tokenizer-side packing — the no-split
    * variant wastes the tail of every pack a long doc would straddle).
    *
    * Emits one row per (document, pack) slice:
    * `(orderCol, pack_id, tok_start, tok_end)` with `[tok_start,
    * tok_end)` the half-open token range of the document that lands in
    * `pack_id` — every pack is exactly `budget` tokens (the last one
    * excepted), integer-exact.
    *
    * Same scale shape as [[runningTotal]] (which computes the global
    * token offsets): two linear exchanges, then the split is a pure
    * map + bounded explode — a document spans ceil(n/budget)+1 packs at
    * most, so fanout is ~rows x (1 + avg_len/budget), linear. */
  def packSplit(df: DataFrame, orderCol: String, valueCol: String,
      budget: Long): DataFrame = {
    val cum = runningTotal(df, orderCol, valueCol, "_cum")
      // _g0 = the document's global token start (exclusive prefix sum)
      .withColumn("_g0", col("_cum") - col(valueCol))
    cum
      // zero-token rows occupy no pack space; dropping them also keeps
      // the sequence() bounds ordered (stop < start would descend)
      .filter(col(valueCol) > 0L)
      .withColumn("pack_id",
        explode(sequence(expr(s"_g0 div $budget"),
          expr(s"(_cum - 1) div $budget"))))
      .select(col(orderCol), col("pack_id"),
        greatest(lit(0L), col("pack_id") * budget - col("_g0")).as("tok_start"),
        least(col(valueCol), (col("pack_id") + 1L) * budget - col("_g0")).as("tok_end"))
  }
}
