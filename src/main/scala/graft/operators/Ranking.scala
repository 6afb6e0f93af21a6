package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-partition-safe top-k-per-group ranking, shared by every
  * operator that keeps k rows per group where groups can be FEW and
  * HOT (t_domain_cap's 20 sources, t_bm25's 3 queries): a single
  * window partitioned by the group would funnel an entire group —
  * corpus/#groups rows, terabytes at 100 TB — into one partition.
  *
  * Phase 1 ranks per (group, input-partition) cell —
  * `spark_partition_id()` spreads each hot group over every input
  * split — and keeps k per cell, which PROVABLY contains the global
  * per-group top-k: any globally-kept row is in its own cell's top-k
  * under the same ordering (the ordering must be total, i.e. carry an
  * id tiebreak, for the output to be deterministic). Phase 2 ranks
  * the survivors (≤ k × #splits per group, KBs) per group. The kept
  * set is identical to the single-window plan; only the exchange
  * topology changes.
  */
object Ranking {

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of ranked
    * lists: input is the UNION of per-list rankings as
    * (query_id, doc_id, rnk) rows; a document's fused score is
    * Σ 10⁶ div (k + rnk) over every list it appears in (integer, so
    * both engines agree bit-for-bit), and the fused top-`topK` per
    * query is kept with (score desc, doc_id) ties. A doc in several
    * lists SUMS its contributions — the property that lets a
    * mid-ranked-everywhere doc beat a top-ranked-once doc, which is
    * the entire point of RRF. The fused relation is lists×topN rows
    * per query (bounded), so the final rank window never sees
    * corpus-shaped input. */
  def rrfFuse(ranked: DataFrame, k: Int = 60, topK: Int = 5): DataFrame = {
    val fused = ranked
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr(s"1000000 div ($k + rnk)")).as("rrf"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("rrf"),
        col("n_lists"))
  }

  /** Append `rankCol` = 1..k per `group` under `ordering` (strongest
    * first; must be total) and drop rows past k. */
  def topKPerGroup(df: DataFrame, group: Seq[Column], ordering: Seq[Column],
      k: Int, rankCol: String): DataFrame = {
    require(k > 0, s"graft: top-k needs k > 0 (got $k)")
    val cell = group :+ col("_tpk_cell")
    val w1 = Window.partitionBy(cell: _*).orderBy(ordering: _*)
    val w2 = Window.partitionBy(group: _*).orderBy(ordering: _*)
    df.withColumn("_tpk_cell", spark_partition_id())
      .withColumn("_tpk_r1", row_number().over(w1))
      .filter(col("_tpk_r1") <= k)
      .withColumn(rankCol, row_number().over(w2).cast("long"))
      .filter(col(rankCol) <= k)
      .drop("_tpk_cell", "_tpk_r1")
  }
}
