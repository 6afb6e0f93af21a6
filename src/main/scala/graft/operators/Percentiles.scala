package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact interpolated quantiles via a distributed value histogram.
  *
  * `percentile()` is an ObjectHashAggregate that buffers EVERY value of
  * a group in one executor's memory — at 100 TB one group holds
  * billions of doubles and OOMs. This operator computes the same
  * interpolated order statistics from `groupBy(value).count()`:
  * executor memory is bounded by the number of DISTINCT values, the
  * heavy lifting is an ordinary partial-aggregated shuffle over
  * (group, value), and the per-group cumulative walk is a window over
  * distinct values only. For quantized domains (quantities, prices in
  * cents) distinct counts stay small no matter how many rows feed in.
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
      ps: Seq[(String, Double)]): DataFrame = {
    val hist = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("double").as("_v"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
    val wAll = Window.partitionBy(col(groupCol))
    val cum = hist
      .withColumn("_cum", sum(col("_c")).over(w)) // 1-indexed end rank of _v
      .withColumn("_n", sum(col("_c")).over(wAll))
      .withColumn("_next", lead(col("_v"), 1).over(w))
    // x_k lives on the row where _cum-_c <= k < _cum; x_{k+1} is the same
    // value unless k+1 == _cum (then it's the next distinct value). Each
    // fraction hits exactly one row per group, so a max(when(hit,..))
    // re-aggregation collapses the histogram without a join per fraction.
    val qCols = ps.map { case (name, p) =>
      val h = lit(p) * (col("_n") - 1).cast("double")
      val k = floor(h)
      val frac = h - k.cast("double")
      val xk = col("_v")
      val xk1 = when(k + 1 < col("_cum"), col("_v")).otherwise(col("_next"))
      val hit = (col("_cum") - col("_c") <= k) && (k < col("_cum"))
      // frac == 0 must not touch xk1: at p = 1.0 (or exact ranks) the
      // next value may be null and 0 * null would null the result.
      val v = when(frac > 0, xk + frac * (xk1 - xk)).otherwise(xk)
      max(when(hit, v)).as(name)
    }
    cum.groupBy(col(groupCol)).agg(qCols.head, qCols.tail: _*)
  }
}
