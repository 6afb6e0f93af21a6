package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's query definitions; each key in
  * [[queries]] has (where SQL-expressible) a DuckDB oracle in
  * [[oracleSql]] with identical column names/rounding/ordering.
  */
object SparkEntry {

  /** All operator modules contributing queries (SURVEY.md §2 blocks). */
  private lazy val modules: Seq[Map[String, QueryDef]] = Seq(
    operators.Relational.defs,
    operators.KafkaSurface.defs,
    operators.Pipeline.defs,
    operators.Retrieval.defs,
    operators.Corpus.defs,
    operators.Graph.defs,
    operators.Selection.defs,
    operators.Winnow.defs,
    operators.Spans.defs,
    operators.StreamQueries.defs)

  private lazy val defs: Map[String, QueryDef] =
    modules.reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case (k, QueryDef(_, Some(sql))) => k -> sql.trim }
}
