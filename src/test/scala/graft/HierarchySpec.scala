package graft

import graft.operators.{Hierarchy, Relational}
import org.apache.spark.sql.functions._

/** Pointer-jumping hierarchy resolution: closed-form chain check,
  * O(log depth) convergence, and the two loud-failure contracts
  * (non-root cycle, dangling parent). */
class HierarchySpec extends SparkSpec {

  test("q_hierarchy: closed-form roots and depths on the chain forest") {
    val out = Relational.qHierarchy.fn(spark, sf).cache()
    val docs = Tables.load(spark, sf, "customer")
    assert(out.count() == docs.count())
    // parent = id-1 except multiples of 100 → root = id - id%100,
    // depth = id%100, exactly
    val bad = out.filter(
      col("root_id") =!= col("id") - col("id") % 100 ||
        col("depth") =!= col("id") % 100)
    assert(bad.isEmpty)
  }

  test("deep chain resolves in logarithmic rounds (under a tight cap)") {
    import spark.implicits._
    // a single 1000-deep chain: depth 1000 must resolve within 12
    // doubling rounds (2^10 > 1000) — naive per-edge iteration would
    // need 1000
    val nodes = (0L to 1000L).toDF("id")
      .select(col("id"), when(col("id") === 0, 0L)
        .otherwise(col("id") - 1).as("parent"))
    val r = Hierarchy.resolveRoots(nodes, "id", "parent", maxIter = 12)
    assert(r.filter(col("root_id") =!= 0L).isEmpty)
    assert(r.filter(col("id") === 1000L).select("depth")
      .first().getLong(0) == 1000L)
  }

  test("non-root cycle fails loudly instead of returning partial ancestors") {
    import spark.implicits._
    val nodes = Seq((1L, 2L), (2L, 1L), (3L, 3L)).toDF("id", "parent")
    val e = intercept[IllegalArgumentException] {
      Hierarchy.resolveRoots(nodes, "id", "parent", maxIter = 8).collect()
    }
    assert(e.getMessage.contains("CYCLE"))
  }

  test("dangling parent pointer rejected before the loop") {
    import spark.implicits._
    val nodes = Seq((1L, 99L), (2L, 2L)).toDF("id", "parent")
    val e = intercept[IllegalArgumentException] {
      Hierarchy.resolveRoots(nodes, "id", "parent").collect()
    }
    assert(e.getMessage.contains("dangling"))
  }
}
