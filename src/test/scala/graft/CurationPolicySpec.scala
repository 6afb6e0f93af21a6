package graft

import graft.operators.Pipeline
import org.apache.spark.sql.functions._

/** Laws for the curation-policy keys: quality-aware keeper selection
  * (d_dedup_keep_quality), per-source vocab coverage
  * (t_vocab_coverage), and the token-budget recipe (t_recipe). */
class CurationPolicySpec extends SparkSpec {

  test("keep_quality: the keeper is the highest-quality member, NOT min id") {
    import spark.implicits._
    // 1 and 2 are near-dups (shingle J = 38/41 >= 0.5); 2 is below the
    // 64-token length-term saturation and strictly longer AND more
    // alphabetic, so quality(2) > quality(1) on two terms with the
    // stopword term 0 for both — the policy must keep 2 even though
    // min-id keep would pick 1. 9 is a singleton and keeps itself.
    val shared = (0 until 40)
      .map(i => ("abcdefghijklmnopqrstuvwxyz" (i % 26).toString) * (i / 26 + 2))
      .mkString(" ")
    val docs = Seq(
      (1L, shared),
      (2L, shared + (" tail" * 15)),
      (9L, "completely different text about other things entirely")
    ).toDF("doc_id", "text")
    val got = Pipeline.keepByQuality(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 9L))
    // 1 and 2 share a cluster labeled by min id (1); keeper is 2
    assert(got(0) === ((1L, 1L, 2L, false)))
    assert(got(1) === ((2L, 1L, 2L, true)))
    // singleton: own cluster, own keeper
    assert(got(2) === ((9L, 9L, 9L, true)))
  }

  test("keep_quality: equal quality ties fall to the minimum id") {
    import spark.implicits._
    val same = (0 until 40)
      .map(i => ("abcdefghijklmnopqrstuvwxyz" (i % 26).toString) * (i / 26 + 2))
      .mkString(" ")
    val docs = Seq((7L, same), (3L, same)).toDF("doc_id", "text")
    val got = Pipeline.keepByQuality(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    assert(got === Array((3L, 3L, true), (7L, 3L, false)))
  }

  test("keep_quality at sf: exactly one keeper per cluster, and it has max quality") {
    val rows = Pipeline.dDedupKeepQuality.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    // a partition of the corpus: every doc exactly once
    assert(rows.map(_._1).distinct.length === rows.length)
    for ((_, cl) <- rows.groupBy(_._2)) {
      val keepers = cl.filter(_._5)
      assert(keepers.length === 1)
      val k = keepers.head
      assert(k._1 === k._4) // kept row IS the keeper id
      val best = cl.map(c => (c._3, -c._1)).max
      assert((k._3, -k._1) === best) // max quality, min-id tiebreak
      assert(cl.forall(_._4 === k._1)) // all rows agree on the keeper
    }
  }

  test("vocab_coverage: covered corpus reads oov 0; rare tail counted exactly") {
    import spark.implicits._
    // source a: "c" x4 + t100..t399 once each (300 distinct singletons).
    // top-200 at topV=200 = "c" + the 199 lexicographically smallest
    // singletons (t100..t298): in-vocab = 4 + 199, oov = 101/304.
    val tail = (100 until 400).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      ("a", s"c c c c $tail"),
      ("b", "c c c")
    ).toDF("source", "text").withColumn("doc_id", lit(1L))
    val got = Pipeline.vocabCoverageOf(docs).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0) === (("a", 304L, 203L, math.floor(101.0 / 304 * 10000) / 10000)))
    assert(got(1) === (("b", 3L, 3L, 0.0)))
  }

  test("recipe: epochs = budget share / own tokens, capped; alloc floors exactly") {
    import spark.implicits._
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    // tokens: a=100, b=400 -> ssq = 10 + 20, tot = 500
    // a: w = 1/3, epochs = 2*500*(1/3)/100 = 10/3 -> 3.3333, alloc 333
    // b: w = 2/3, epochs = 2*500*(2/3)/400 = 5/3 -> 1.6666, alloc 666
    val docs = Seq(("a", words(100)), ("b", words(400)))
      .toDF("source", "text").withColumn("doc_id", lit(1L))
    val got = Pipeline.recipeOf(docs).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    assert(got(0) === (("a", 100L, 0.3333, 3.3333, 333L)))
    assert(got(1) === (("b", 400L, 0.6666, 1.6666, 666L)))
  }

  test("recipe: a tiny source hits the 4-epoch cap; alloc = 4x its tokens") {
    import spark.implicits._
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(("tiny", words(4)), ("big", words(10000)))
      .toDF("source", "text").withColumn("doc_id", lit(1L))
    val byName = Pipeline.recipeOf(docs).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getLong(4)))
    val tiny = byName.find(_._1 == "tiny").get
    assert(tiny._2 === 4.0)
    assert(tiny._3 === 16L)
    val big = byName.find(_._1 == "big").get
    assert(big._2 < 4.0)
  }
}
