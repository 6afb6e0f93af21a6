package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salting for skewed equi-joins — the manual fallback when
  * AQE's runtime skew-split can't apply (e.g. the skewed side feeds a
  * co-partitioned downstream stage, or the join is already bucketed).
  *
  * A hot key's rows all hash to one shuffle partition; salting
  * decomposes key -> (key, salt) with a deterministic per-row salt on
  * the big side, and replicates the small side `salt` ways. The hot
  * partition splits into `salt` partitions; output is identical to the
  * unsalted join. Replication multiplies the small side by `salt` — use
  * for moderate fan-out dims that are too big to broadcast whole but
  * whose x`salt` copy is still shuffle-cheap relative to the skew.
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) with `small`, salted `salt` ways.
    * Salt is a hash of the key plus a bounded subset of payload columns:
    * ROW-CONTENT-deterministic, so a re-executed map task (after a
    * shuffle-fetch failure) reassigns identical salts — position-based
    * schemes like monotonically_increasing_id are order-dependent and
    * can duplicate/lose rows on retry. Salt inputs are restricted to
    * ATOMIC column types (`xxhash64` rejects maps — and structs/arrays
    * containing them — at analysis time; events.props is a MapType),
    * capped at the key plus 8 atomic non-key columns: enough entropy
    * to spread duplicate-prefix rows while the salting projection
    * stays O(1) in row width (hashing every column of a 400-column
    * table would make the salt itself a measurable cost). The 8 are
    * picked HIGH-ENTROPY-FIRST, not first-by-position: wide types
    * (string/binary, then fractional, then long/timestamp) before
    * narrow ones (int/date, then boolean/byte) — a table whose leading
    * columns are low-cardinality flags/enums would otherwise
    * concentrate a hot key's duplicate-prefix rows into few salt
    * buckets, quietly defeating the spread.
    * Caveat: fully identical rows of a hot key share a salt bucket by
    * construction — content-determinism and perfect spreading of exact
    * duplicates are mutually exclusive; retry safety wins here. Any salt
    * assignment is correct (each big row meets every small replica of
    * its key once); content just spreads a hot key's rows evenly. */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salt: Int): DataFrame = {
    import org.apache.spark.sql.types._
    def hashable(dt: DataType): Boolean = dt match {
      case _: NumericType | StringType | BinaryType | BooleanType |
           DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    // entropy rank: lower = likelier to vary row-to-row
    def rank(dt: DataType): Int = dt match {
      case StringType | BinaryType => 0
      case DoubleType | FloatType | _: DecimalType => 1
      case LongType | TimestampType | TimestampNTZType => 2
      case IntegerType | DateType => 3
      case _ => 4 // short/byte/boolean: enums and flags
    }
    val atomic = big.schema.fields.filter(f => hashable(f.dataType))
      .sortBy(f => rank(f.dataType)) // stable: position breaks rank ties
      .map(_.name)
    val saltInputs = (bigKey +: atomic.filterNot(_ == bigKey).take(8).toSeq).distinct
      .map(col)
    val saltCol: Column = pmod(xxhash64(saltInputs: _*), lit(salt))
    val b = big.withColumn("__salt", saltCol.cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<int>")))
    b.join(s, b("__salt") === s("__salt") && col(bigKey) === col(smallKey))
      .drop("__salt")
  }
}
