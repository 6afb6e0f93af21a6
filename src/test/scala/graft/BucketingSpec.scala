package graft

import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle: writing both join sides bucketed on
  * the join key lets the join run co-located, with zero Exchange —
  * the layout a 100 TB fact/fact join wants. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact/fact join runs with no shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS gb_lineitem")
      spark.sql("DROP TABLE IF EXISTS gb_orders")
      Tables.load(spark, sf, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("gb_lineitem")
      Tables.load(spark, sf, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("gb_orders")

      val joinOnly = spark.table("gb_lineitem")
        .join(spark.table("gb_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joinOnly.queryExecution.executedPlan.toString()
      val joined = joinOnly
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_quantity")), 4).as("qty"))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")

      // and it computes the right thing
      val expected = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_quantity")), 4).as("qty"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS gb_lineitem")
      spark.sql("DROP TABLE IF EXISTS gb_orders")
    }
  }
}
