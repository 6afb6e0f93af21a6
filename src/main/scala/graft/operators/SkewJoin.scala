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
    * Salt is hash(key, row position): deterministic (no rand()), and —
    * unlike hashing the whole row — costs O(1) per row no matter how
    * wide the payload is. Any salt assignment is correct (each big row
    * meets every small replica of its key once); position just spreads
    * a hot key's rows evenly. */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salt: Int): DataFrame = {
    val saltCol: Column =
      pmod(xxhash64(col(bigKey), monotonically_increasing_id()), lit(salt))
    val b = big.withColumn("__salt", saltCol.cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<int>")))
    b.join(s, b("__salt") === s("__salt") && col(bigKey) === col(smallKey))
      .drop("__salt")
  }
}
