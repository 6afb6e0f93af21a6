package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** runningTotal must equal the single-partition `sum() OVER (ORDER BY)`
  * it replaces, across slice boundaries and degenerate sizes. */
class PrefixSumSpec extends SparkSpec {

  test("running total equals a global ordered window") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(i => (i.toLong, rnd.nextInt(100).toLong))
      .toDF("k", "v")
      .repartition(16) // scrambled input: the operator must re-order
    val got = PrefixSum.runningTotal(df, "k", "v", "cum")
      .orderBy(col("k")).select(col("k"), col("cum")).collect()
    val want = df
      .withColumn("cum", sum(col("v")).over(Window.orderBy(col("k"))))
      .orderBy(col("k")).select(col("k"), col("cum")).collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) === w.getLong(0))
      assert(g.getLong(1) === w.getLong(1), s"k=${g.getLong(0)}")
    }
  }

  test("single row and empty input") {
    import spark.implicits._
    val one = Seq((1L, 5L)).toDF("k", "v")
    val r = PrefixSum.runningTotal(one, "k", "v", "cum").collect()
    assert(r.length === 1 && r(0).getAs[Long]("cum") === 5L)
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixSum.runningTotal(empty, "k", "v", "cum").count() === 0L)
  }

  test("t_pack packs are contiguous and budget-aligned") {
    val df = operators.Pipeline.tPack.fn(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val cum = r.getAs[Long]("cum_tokens")
      val pack = r.getAs[Long]("pack_id")
      assert(pack === (cum - n) / 512,
        s"doc ${r.getAs[Long]("doc_id")}: pack $pack vs cum $cum n $n")
    }
    // pack ids never decrease in doc order and never skip more than
    // one boundary per doc unless the doc itself spans multiple packs
    val packs = rows.map(_.getAs[Long]("pack_id"))
    assert(packs.zip(packs.tail).forall { case (a, b) => b >= a })
  }
}
