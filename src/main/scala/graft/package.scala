import org.apache.spark.sql.{DataFrame, SparkSession}

/** Graft: a Spark-native analytics engine with the query surface of the
  * reference Kafka-backed-table engine (see SURVEY.md), plus large-scale
  * training-data pipeline operators (dedup / similarity / text analysis).
  */
package object graft {
  /** A driver-runnable query: (session, scale-factor dir) => result. */
  type QueryFn = (SparkSession, String) => DataFrame

  /** A named query plus its DuckDB oracle SQL (None => rows-only check). */
  final case class QueryDef(fn: QueryFn, oracle: Option[String])
}
