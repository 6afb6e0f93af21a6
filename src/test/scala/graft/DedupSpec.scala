package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("exact dedup flags constructed duplicates, keeps first id") {
    import spark.implicits._
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ===
      Seq((1L, false), (2L, false), (3L, true), (4L, true)))
  }

  test("minhash LSH finds planted near-dup pairs with high jaccard") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // near-dups planted by the generator (confirmed by exact char-level
    // jaccard >= 0.95 across three independent methods)
    for (p <- Seq((0L, 50L), (0L, 82L), (5L, 450L))) {
      assert(pairs.contains(p), s"missing planted pair $p")
      assert(pairs(p) > 0.8)
    }
    assert(pairs.values.forall(_ >= 0.5))
  }

  test("simhash pairs are within the hamming bound and cover planted dups") {
    val got = Dedup.simhashPairs(docs, "text", "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got.values.forall(_ <= 3))
    assert(got.contains((0L, 50L)) && got.contains((5L, 450L)))
  }

  test("ngram jaccard pairs respect the threshold and ordering") {
    val got = Dedup.ngramJaccardPairs(docs, "text", "doc_id").collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getLong(0) < r.getLong(1)))
    assert(got.forall(r => r.getDouble(2) >= 0.7))
  }

  test("embedding LSH pairs are cosine-verified above threshold") {
    val emb = Tables.load(spark, sf, "embeddings")
    val got = Dedup.embeddingPairs(emb, "embedding", "vec_id").collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getDouble(2) >= 0.35))
    assert(got.forall(r => r.getLong(0) < r.getLong(1)))
    // no duplicate pairs across LSH tables
    val keys = got.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length)
  }
}
