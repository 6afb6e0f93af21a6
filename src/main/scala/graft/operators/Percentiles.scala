package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact interpolated quantiles via a distributed value histogram.
  *
  * `percentile()` is an ObjectHashAggregate that buffers EVERY value of
  * a group in one executor's memory — at 100 TB one group holds
  * billions of doubles and OOMs. This operator computes the same
  * interpolated order statistics from `groupBy(value).count()`:
  * executor memory is bounded by DISTINCT values per range slice, and
  * the cumulative ranks come from a distributed prefix sum rather than
  * a per-group window — a `Window.partitionBy(group)` would serialize
  * each group into one partition (parallelism = #groups, the wrong
  * shape when a billion-row group has millions of distinct values).
  *
  * Plan shape: partial-agg histogram shuffle -> range repartition by
  * (group, var, value) -> per-slice local cumsum (window keyed by slice
  * id, so every slice runs in parallel) -> broadcast join of per-slice
  * offsets (#slices x #groups x #vars rows) -> one final tiny
  * re-aggregation. Multiple value columns melt into ONE pipeline
  * (var-tagged rows), so n columns cost one histogram pass, not n.
  */
object Percentiles {

  /** One row per group with a column per requested fraction, matching
    * `percentile()` / DuckDB `quantile_cont` semantics exactly:
    * h = p*(n-1) (0-indexed rank), result = x_k + (h-k)*(x_{k+1}-x_k)
    * with k = floor(h).
    *
    * @param ps (outputName, fraction) pairs, all over `valueCol`.
    */
  def histQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)]): DataFrame =
    histQuantilesMulti(df, groupCol, Seq(valueCol -> ps))

  /** Quantiles over several value columns in one distributed pass.
    *
    * @param specs per value column, its (outputName, fraction) pairs;
    *              output names must be globally unique.
    */
  def histQuantilesMulti(df: DataFrame, groupCol: String,
      specs: Seq[(String, Seq[(String, Double)])]): DataFrame = {
    val melted = df
      .select(col(groupCol), explode(array(specs.zipWithIndex.map {
        case ((vc, _), i) =>
          struct(lit(i).as("_var"), col(vc).cast("double").as("_v"))
      }: _*)).as("_e"))
      .select(col(groupCol), col("_e._var").as("_var"), col("_e._v").as("_v"))
      .filter(col("_v").isNotNull)
    val hist = melted
      .groupBy(col(groupCol), col("_var"), col("_v"))
      .agg(count(lit(1)).as("_c"))
    // Distributed prefix sum: range partitioning guarantees slice i
    // holds only (group, var, value) triples ordered before slice i+1,
    // so global rank = rank within the slice + total count of the
    // (group, var)'s earlier slices. The slice-local window
    // parallelizes across (slice, group, var); the offset table is
    // tiny and broadcast.
    val parts = hist.repartitionByRange(col(groupCol), col("_var"), col("_v"))
      .withColumn("_pid", spark_partition_id())
    val wSlice = Window.partitionBy(col("_pid"), col(groupCol), col("_var"))
      .orderBy(col("_v"))
    val localCum = parts.withColumn("_lcum", sum(col("_c")).over(wSlice))
    val totals = parts.groupBy(col("_pid"), col(groupCol), col("_var"))
      .agg(sum(col("_c")).as("_pt"))
    val wOff = Window.partitionBy(col(groupCol), col("_var")).orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_off", coalesce(sum(col("_pt")).over(wOff), lit(0L)))
      .drop("_pt")
    val ns = totals.groupBy(col(groupCol), col("_var")).agg(sum(col("_pt")).as("_n"))
    val cum = localCum
      .join(broadcast(offsets), Seq("_pid", groupCol, "_var"))
      .join(broadcast(ns), Seq(groupCol, "_var"))
      .withColumn("_cum", col("_lcum") + col("_off"))
    // The order statistics x_k and x_{k+1} each live on exactly one
    // histogram row (the one whose rank range [_cum-_c, _cum) covers
    // them), so a max(when(hit,..)) re-aggregation collapses the
    // histogram without a join or lead() per fraction. _n rides on
    // every row of its (group, var), so rank targets are row-local.
    def h(p: Double) = lit(p) * (col("_n") - 1).cast("double")
    def hit(rank: Column) = (col("_cum") - col("_c") <= rank) && (rank < col("_cum"))
    val aggs = specs.zipWithIndex.flatMap { case ((_, ps), i) =>
      ps.flatMap { case (name, p) =>
        val k = floor(h(p))
        val inVar = col("_var") === i
        Seq(max(when(inVar && hit(k), col("_v"))).as(s"_${name}_lo"),
          max(when(inVar && hit(k + 1), col("_v"))).as(s"_${name}_hi"),
          max(when(inVar, col("_n"))).as(s"_${name}_n"))
      }
    }
    val agged = cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val outCols = col(groupCol) +: specs.flatMap { case (_, ps) =>
      ps.map { case (name, p) =>
        val hh = lit(p) * (col(s"_${name}_n") - 1).cast("double")
        val k = floor(hh)
        val frac = hh - k.cast("double")
        val lo = col(s"_${name}_lo")
        val hi = col(s"_${name}_hi")
        // frac == 0 must not touch hi: at p = 1.0 no row holds rank
        // k+1 and 0 * null would null the result.
        when(frac > 0, lo + frac * (hi - lo)).otherwise(lo).as(name)
      }
    }
    agged.select(outCols: _*)
  }
}
