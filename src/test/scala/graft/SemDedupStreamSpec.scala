package graft

import graft.operators.{Dedup, StreamQueries}
import graft.plans.BroadcastCentroids
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming semantic-dedup batch step ([[StreamQueries
  * .semDedupBatch]]) on constructed 2-d vectors where every decision
  * is decidable by hand: first-seen-wins against accumulated keepers,
  * the within-batch min-id keep rule, cross-batch keeper visibility,
  * and redelivery idempotency through the below-b chain view. */
class SemDedupStreamSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def freshBase(): String = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_ssem_spec"
    deleteRecursively(new java.io.File(base))
    base
  }

  // two orthogonal cells; probes floor at nlist so blocking is total
  // and only the DECISION rules are under test
  private val cents = Array(Seq(1f, 0f), Seq(0f, 1f))
  private def centRef = BroadcastCentroids(
    spark.sparkContext.broadcast(cents.map(_.toArray)))
  private def centDf = vecs(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
    .select(col("vec_id").as("seed_id"), col("embedding").as("sv"))

  private def setup(base: String, keepers: DataFrame): Unit = {
    keepers.write.mode("overwrite").parquet(s"$base/keep/v0")
    Dedup.probeAssign(keepers, "embedding", "vec_id", centRef, 2, 4)
      .select(col("lid"), col("vec_id"))
      .write.mode("overwrite").parquet(s"$base/post/v0")
    keepers.filter(lit(false))
      .select(col("vec_id"), col("vec_id").as("match_id"),
        col("vec_id").as("rep_id"))
      .write.mode("overwrite").parquet(s"$base/drop/v0")
  }

  private def runBatch(base: String, batch: DataFrame, b: Long): Unit =
    StreamQueries.semDedupBatch(spark, base, centRef, centDf,
      nlist = 2, probes = 4, arrivalProbes = 4, batch = batch, b = b)

  private def drops(base: String, b: Long): Set[(Long, Long, Long)] =
    spark.read.parquet(s"$base/drop/x$b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def kept(base: String, b: Long): Set[Long] =
    spark.read.parquet(s"$base/keep/k$b").collect()
      .map(_.getLong(0)).toSet

  test("keeper match drops, within-batch pair keeps the min id, unique survives") {
    val base = freshBase()
    setup(base, vecs(0L -> Seq(1f, 0f)))
    runBatch(base, vecs(
      100L -> Seq(0.999f, 0.01f),  // near keeper 0 -> dropped
      101L -> Seq(0f, 1f),         // unique -> kept
      102L -> Seq(0.01f, 0.999f)), // near 101 -> within-batch drop
      b = 0L)
    assert(drops(base, 0L) === Set((100L, 0L, 0L), (102L, 101L, 101L)))
    assert(kept(base, 0L) === Set(101L))
  }

  test("a later batch sees earlier survivors as keepers") {
    val base = freshBase()
    setup(base, vecs(0L -> Seq(1f, 0f)))
    runBatch(base, vecs(101L -> Seq(0f, 1f)), b = 0L)
    runBatch(base, vecs(200L -> Seq(0.02f, 0.998f)), b = 1L)
    assert(drops(base, 1L) === Set((200L, 101L, 101L)))
    assert(kept(base, 1L) === Set.empty[Long])
  }

  test("redelivery replays the identical decisions (below-b chain view)") {
    val base = freshBase()
    setup(base, vecs(0L -> Seq(1f, 0f)))
    val b0 = vecs(101L -> Seq(0f, 1f), 102L -> Seq(0.01f, 0.999f))
    runBatch(base, b0, b = 0L)
    runBatch(base, vecs(200L -> Seq(0.02f, 0.998f)), b = 1L)
    val d0 = drops(base, 0L); val k0 = kept(base, 0L)
    // redeliver batch 0 AFTER batch 1's links exist: the below-b view
    // must hide them, so the replay reproduces the original links —
    // in particular 101 must NOT be dropped against its own first
    // delivery (or batch 1's keepers)
    runBatch(base, b0, b = 0L)
    assert(drops(base, 0L) === d0)
    assert(kept(base, 0L) === k0)
    assert(k0 === Set(101L))
  }

  test("a sub-threshold neighbor does not drop") {
    val base = freshBase()
    // keeper at 45 degrees: cos to [1,0] is ~0.707 >= tau, but cos to
    // [-0.5, 0.866] is ~0.25 < tau = 0.35 -> kept
    setup(base, vecs(0L -> Seq(1f, 0f)))
    runBatch(base, vecs(300L -> Seq(-0.5f, 0.866f)), b = 0L)
    assert(drops(base, 0L).isEmpty)
    assert(kept(base, 0L) === Set(300L))
  }
}
