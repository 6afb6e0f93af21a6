package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join with no equi key.
  *
  * Spark plans a pure inequality join as BroadcastNestedLoopJoin (or a
  * cartesian product if neither side fits in memory) — every point is
  * tested against every interval, O(n*m) compared work and a broadcast
  * that OOMs once the interval side scales. This operator turns the
  * range predicate into an equi-join: fixed-width time buckets, the
  * interval side exploded to every bucket it covers, then the exact
  * predicate as a post-join filter.
  *
  * A point lives in exactly ONE bucket and a matching interval covers
  * that bucket, so the bucket equi-join finds each qualifying pair
  * exactly once — no dedup pass. Shuffle volume is points + intervals x
  * avg-buckets-per-interval, a shuffle-hash/sort-merge join that scales
  * linearly; pick `bucketWidth` near the typical interval length so the
  * explode factor stays ~2.
  */
object RangeJoin {

  /** Join `points` (timestamp `pointCol`) to `intervals`
    * ([startCol, endCol) half-open timestamps); returns the matched
    * pairs with all columns of both inputs. `bucketWidth` in seconds.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long = 600L): DataFrame = {
    val w = lit(bucketWidth * 1000000L) // micros
    def bucketOf(c: Column): Column = floor(unix_micros(c) / w)
    val p = points.withColumn("_bucket", bucketOf(col(pointCol)))
    // endCol is exclusive, but a boundary-aligned end costs one empty
    // bucket at most — the exact filter below discards it
    val iv = intervals.withColumn("_bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(iv, Seq("_bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bucket")
  }
}
