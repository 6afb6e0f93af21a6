package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 10)

  test("brute-force top-k: k rows per query, descending, no self-match") {
    val got = Similarity.bruteTopK(emb, queries, "embedding", "vec_id", k = 5).collect()
    assert(got.length === 50)
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getDouble(2)).sliding(2).forall(p => p.head >= p.last))
      assert(sorted.forall(r => r.getLong(1) != r.getLong(0)))
    }
  }

  test("IVF top-k: self-recovery, ranked output, sane recall vs brute") {
    // query with exact corpus vectors: each query's own list is its
    // top probe, so rnk=1 must be a perfect-cosine match
    val got = Similarity.ivfTopK(emb, queries, "embedding", "vec_id", k = 5)
      .collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getDouble(2)).sliding(2).forall(p => p.head >= p.last))
      assert(sorted.forall(r => r.getLong(1) != r.getLong(0)))
    }
    val brute = Similarity.bruteTopK(emb, queries, "embedding", "vec_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfPairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivfPairs).size.toDouble / brute.size
    assert(recall > 0.2, s"IVF recall vs brute too low: $recall")
  }

  test("LSH top-k: subset of corpus with valid cosines, recall > 0") {
    val brute = Similarity.bruteTopK(emb, queries, "embedding", "vec_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, queries, "embedding", "vec_id", k = 5)
      .collect()
    assert(lsh.nonEmpty)
    val lshPairs = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lshPairs).size.toDouble / brute.size
    assert(recall > 0.2, s"LSH recall vs brute too low: $recall")
  }
}
