package graft

import graft.operators.Percentiles
import org.apache.spark.sql.functions._

/** histQuantiles must reproduce percentile()'s interpolated order
  * statistics exactly — including single-row groups, duplicate-heavy
  * histograms, and the p=0/p=1 endpoints. */
class PercentilesSpec extends SparkSpec {

  test("histogram quantiles equal percentile() on edge-case groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows =
      Seq(("one", 42.0)) ++ // single-row group
      Seq(("two", 1.0), ("two", 2.0)) ++ // two rows: every p interpolates
      (1 to 997).map(_ => ("dups", (rnd.nextInt(5) + 1).toDouble)) ++ // 5 distinct values
      (1 to 1003).map(_ => ("wide", rnd.nextDouble() * 1000)) // ~all distinct
    val df = rows.toDF("g", "v")
    val ps = Seq("p0" -> 0.0, "p37" -> 0.37, "p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0)

    val got = Percentiles.histQuantiles(df, "g", "v", ps)
      .orderBy(col("g")).collect()
    val exp = df.groupBy(col("g"))
      .agg(expr(s"percentile(v, array(${ps.map(_._2).mkString(",")}))").as("q"))
      .orderBy(col("g")).collect()

    assert(got.length === exp.length)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getString(0) === e.getString(0))
      val want = e.getSeq[Double](1)
      ps.indices.foreach { i =>
        assert(math.abs(g.getDouble(i + 1) - want(i)) < 1e-9,
          s"group ${g.getString(0)} ${ps(i)._1}: got ${g.getDouble(i + 1)}, want ${want(i)}")
      }
    }
  }

  test("null values are ignored like percentile() ignores them") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("a", Some(2.0)))
      .toDF("g", "v")
    val got = Percentiles.histQuantiles(df, "g", "v", Seq("p50" -> 0.5)).head()
    assert(got.getDouble(1) === 2.0)
  }
}
