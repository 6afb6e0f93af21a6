package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row of
  * the same key with right.time <= left.time.
  *
  * Spark has no native as-of operator; the scalable formulation is the
  * union-and-carry-forward plan rather than a range join:
  * tag both sides, union on (key, time), and window-carry the last
  * non-null right payload forward. Cost is ONE shuffle on the key (the
  * window's partitioning) — no per-pair candidate explosion, no range
  * cross product, so it survives arbitrarily dense right sides. This is
  * the same plan shape DuckDB/kdb execute natively for ASOF JOIN.
  *
  * The right side must be unique per (key, time) — pre-aggregate ties
  * (e.g. with max_by) or the carried row among ties is unspecified.
  * Left rows with no qualifying right row get a null payload (left
  * semantics).
  */
object AsOfJoin {

  /** @param payload right-side columns to carry; arrive as `asof_<name>` */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right.select(
      col(rightKey).as("__k"),
      col(rightTime).as("__t"),
      struct(payload.map(col): _*).as("__p"))
      .withColumn("__side", lit(0))
    // right rows sort before left rows at equal time => inclusive <=
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = payload.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"__m.$c"))
    }
    out.drop("__k", "__t", "__side", "__p", "__m")
  }
}
