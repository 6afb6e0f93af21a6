package graft

import graft.operators.{Relational, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the scale properties SURVEY.md §4 claims
  * (pushdown, pruning, broadcast, no corpus shuffle) are checked here,
  * not just eyeballed. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("q1: shipdate filter and column pruning reach the parquet scan") {
    val p = plan(Relational.q1Agg.fn(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    // pruned: no l_comment / l_shipmode etc in the read schema
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"))
  }

  test("q3/q5: small dims still broadcast WITHOUT a hint on scaling tables") {
    // customer/supplier carry no broadcast() hint (they scale with SF —
    // a forced broadcast OOMs at 100 TB); at test SF the size-based
    // planner/AQE still picks broadcast, and bounded dims (nation,
    // region) stay explicitly hinted.
    val p3 = plan(Relational.q3Shipping.fn(spark, sf))
    assert(p3.contains("BroadcastHashJoin"))
    val p5 = plan(Relational.q5Local.fn(spark, sf))
    assert(p5.contains("BroadcastHashJoin"))
    assert(p5.contains("BroadcastExchange"))
  }

  test("brute-force ANN: query set broadcast, corpus never exchanged") {
    val emb = Tables.load(spark, sf, "embeddings")
    val p = plan(Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 10),
      "embedding", "vec_id"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    // partial top-k runs map-side before any shuffle (WindowGroupLimit
    // below the Exchange), and the only non-broadcast exchanges are the
    // per-query window shuffle + the presentation sort — count them in
    // the tree section only (details repeat each node once more)
    val tree = p.linesIterator.takeWhile(!_.trim.startsWith("(1)")).toSeq
    val exchanges = tree.count(l =>
      l.contains("- Exchange") && !l.contains("BroadcastExchange"))
    assert(exchanges <= 2, s"corpus should not shuffle:\n$p")
    assert(p.contains("WindowGroupLimit"), "expected map-side partial top-k")
  }

  test("k-means assignment is a pure map-side projection — zero shuffle") {
    val emb = Tables.load(spark, sf, "embeddings")
    val p = plan(Similarity.kmeansAssign(emb, "embedding", "vec_id", k = 8, iters = 1))
    assert(p.contains("graft_nearest_centroid"), p)
    val tree = p.linesIterator.takeWhile(!_.trim.startsWith("(1)")).toSeq
    assert(!tree.exists(_.contains("- Exchange")),
      s"corpus must not shuffle for cluster assignment:\n$p")
  }

  test("as-of join is one shuffle on the key — no range cross product") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L)).toDF("lid", "k", "t")
    val right = Seq((100L, 5L, "x")).toDF("k", "t", "v")
    val p = plan(operators.AsOfJoin.asOf(left, right, "k", "k", "t", "t", Seq("v")))
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    val tree = p.linesIterator.takeWhile(!_.trim.startsWith("(1)")).toSeq
    assert(tree.count(_.contains("- Exchange")) === 1,
      s"expected exactly the window's key shuffle:\n$p")
  }

  test("salted join equals plain join and keys the shuffle on (key, salt)") {
    import spark.implicits._
    // skewed big side: one hot key carrying most rows
    val big = (1L to 2000L).map(i => (if (i % 10 == 0) i else 7L, i))
      .toDF("k", "payload")
    val small = Seq((7L, "hot"), (20L, "a"), (30L, "b")).toDF("sk", "v")
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "payload", "v").collect().toSet
    val salted = operators.SkewJoin.saltedJoin(big, small, "k", "sk", salt = 8)
      .select("k", "payload", "v").collect().toSet
    assert(salted === plain)
    assert(plain.count(_.getString(2) == "hot") > 0)
  }

  test("salted join tolerates unhashable columns on the big side") {
    import spark.implicits._
    // a MapType payload column (events.props shape) must not feed the
    // xxhash64 salt — it would fail analysis
    val big = (1L to 200L).map(i => (7L, Map("a" -> i), i)).toDF("k", "props", "payload")
    val small = Seq((7L, "hot")).toDF("sk", "v")
    val salted = operators.SkewJoin.saltedJoin(big, small, "k", "sk", salt = 4)
      .select("k", "payload", "v").collect()
    assert(salted.length === 200)
    assert(salted.forall(r => r.getLong(0) == 7L && r.getString(2) == "hot"))
  }

  test("t_sample reads only doc_id from the parquet scan") {
    val p = plan(operators.Pipeline.tSample.fn(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("doc_id") && !readSchema.contains("text"),
      readSchema)
  }

  test("q_approx_distinct: no HLL buffer per distinct key") {
    // the sketch and the exact count must plan as separate aggregations
    // (joined at 3 rows); one combined Aggregate would carry a ~21 KB
    // HLL buffer per (flag, orderkey) group through Expand + shuffle
    val p = plan(Relational.qApproxDistinct.fn(spark, sf))
    val tree = p.linesIterator.takeWhile(!_.trim.startsWith("(1)")).toSeq
    assert(!tree.exists(_.contains("Expand")),
      s"distinct rewrite (Expand) means the aggregates were combined:\n$p")
  }

  test("prefix sum: the only unpartitioned window is over slice totals") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i)).toDF("k", "v")
    val p = plan(operators.PrefixSum.runningTotal(df, "k", "v", "cum"))
    // data-path window is keyed by _pid; the global window feeds from
    // the per-slice aggregate (one row per slice), then broadcasts
    assert(p.toLowerCase.contains("rangepartitioning"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("scalar pipeline stays in whole-stage codegen") {
    val df = Tables.load(spark, sf, "documents")
      .select(functions.MinHash.hashedWordShingles(col("text"), 3).as("sh"))
      .select(functions.MinHash.bandKeys(col("sh"), 16, 4).as("bk"))
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(p.contains("WholeStageCodegen subtrees"), p)
    assert(!p.contains("Found 0 WholeStageCodegen"), p)
  }
}
