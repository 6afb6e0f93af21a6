package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Pins the no-hidden-scan contract of AUTO sizing: `embeddingPairs` /
  * `lshTopK` / `ivfTopK` size their LSH buckets / IVF lists from the
  * corpus row count, which costs a full (column-pruned) count() pass
  * per CALL when the caller doesn't know better — at 100 TB that is an
  * extra scan of the corpus every time the operator is invoked. A
  * caller-supplied `rowHint` must skip that job entirely, and the
  * sized shape must match what the real count would have produced.
  */
class NoHiddenScanSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 5)
  private lazy val docs = Tables.load(spark, sf, "documents")

  /** Jobs launched while constructing (NOT executing) `body`'s result.
    * The hidden count() runs eagerly at DataFrame-construction time —
    * that is exactly what makes it hidden — so a construction-phase
    * job counter catches it deterministically once the listener bus
    * is drained. */
  private def jobsDuringConstruction(body: => Any): Int = {
    // materialize the inputs' FileIndex/schema outside the measurement
    // window: the FIRST touch of a parquet DataFrame launches a
    // listing/footer job that would otherwise be misattributed to the
    // operator under test
    emb.count(); queries.count(); docs.count()
    val n = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        { n.incrementAndGet(); () }
    }
    Bridge.drainListenerBus(spark) // flush events from earlier tests
    spark.sparkContext.addSparkListener(listener)
    try { body; Bridge.drainListenerBus(spark) }
    finally spark.sparkContext.removeSparkListener(listener)
    n.get
  }

  test("embeddingPairs with rowHint launches no job at construction; without, it counts") {
    val hinted = jobsDuringConstruction(
      Dedup.embeddingPairs(emb, "embedding", "vec_id", rowHint = 10000L))
    assert(hinted === 0, "rowHint call must not launch any Spark job")
    val auto = jobsDuringConstruction(
      Dedup.embeddingPairs(emb, "embedding", "vec_id"))
    assert(auto >= 1, "AUTO without hint sizes from a real count() job")
  }

  test("lshTopK with full hints launches no job at construction") {
    // the density-adaptive default needs n AND the two cosine
    // densities; a production caller that knows all three (corpus
    // card, prior measureDensity run) pays zero construction jobs
    val hinted = jobsDuringConstruction(
      Similarity.lshTopK(emb, queries, "embedding", "vec_id",
        rowHint = 10000L, cosBgHint = 0.0, cosTrueHint = 0.3))
    assert(hinted === 0, "fully-hinted call must not launch any Spark job")
    // rowHint alone still skips the count but pays the bounded
    // density sample; no hints pays count + sample
    val auto = jobsDuringConstruction(
      Similarity.lshTopK(emb, queries, "embedding", "vec_id"))
    assert(auto >= 1, "AUTO without hints measures density with real jobs")
  }

  test("ivfTopK with rowHint runs only the quantizer-training jobs, no count") {
    // quantizer training runs collect() jobs at construction by design
    // (KB-scale driver artifact), so the contract here is relative: a
    // hinted call must cost exactly what the same shape costs with
    // nlist pinned explicitly (= training only), and strictly less
    // than AUTO, whose extra jobs are the hidden count (2 jobs under
    // AQE, hence no exact +1 assertion)
    val hinted = jobsDuringConstruction(
      Similarity.ivfTopK(emb, queries, "embedding", "vec_id", rowHint = 10000L))
    val pinned = jobsDuringConstruction(
      Similarity.ivfTopK(emb, queries, "embedding", "vec_id", nlist = 100))
    val auto = jobsDuringConstruction(
      Similarity.ivfTopK(emb, queries, "embedding", "vec_id"))
    assert(hinted === pinned,
      s"rowHint ($hinted jobs) must cost the same as explicit nlist ($pinned)")
    assert(auto > hinted,
      s"AUTO ($auto jobs) must pay count jobs a hinted call ($hinted) skips")
  }

  test("a rowHint equal to the true count reproduces the AUTO result exactly") {
    val n = emb.count()
    val hinted = Dedup.embeddingPairs(emb, "embedding", "vec_id", rowHint = n)
      .orderBy(col("id_a"), col("id_b")).collect().toSeq
    val auto = Dedup.embeddingPairs(emb, "embedding", "vec_id")
      .orderBy(col("id_a"), col("id_b")).collect().toSeq
    assert(hinted === auto)
  }

  test("explicit bits/nlist never count, with or without hint") {
    val jobs = jobsDuringConstruction {
      Dedup.embeddingPairs(emb, "embedding", "vec_id", bits = 8)
      Similarity.lshTopK(emb, queries, "embedding", "vec_id", bits = 8)
    }
    assert(jobs === 0)
  }

  test("ivfPqTopK with precomputed artifacts launches no job at construction") {
    // the train-once / encode-once / query-many workflow: artifacts
    // built OUTSIDE the window, then the query-side call must plan
    // without training, counting, or scanning anything
    val cents = Similarity.trainQuantizer(emb, "embedding", "vec_id",
      nlist = 16, iters = 1)
    val books = Similarity.trainCodebooks(emb, "embedding", "vec_id")
    val index = Similarity.ivfPqEncode(emb, "embedding", "vec_id", cents, books)
    val jobs = jobsDuringConstruction(
      Similarity.ivfPqTopK(emb, queries, "embedding", "vec_id",
        centroids = Some(cents), codebooks = Some(books), index = Some(index)))
    assert(jobs === 0)
  }

  test("semanticPairs with rowHint launches no job at construction; without, it counts") {
    val hinted = jobsDuringConstruction(
      Dedup.semanticPairs(emb, "embedding", "vec_id", rowHint = 10000L))
    assert(hinted === 0, "rowHint call must not launch any Spark job")
    val pinned = jobsDuringConstruction(
      Dedup.semanticPairs(emb, "embedding", "vec_id", k = 16))
    assert(pinned === 0, "explicit k must not launch any Spark job")
    val auto = jobsDuringConstruction(
      Dedup.semanticPairs(emb, "embedding", "vec_id"))
    assert(auto >= 1, "AUTO without hint sizes from a real count() job")
  }

  test("ngramJaccardPairs with rowHint or pinned shape launches no job") {
    val hinted = jobsDuringConstruction(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", rowHint = 10000L))
    assert(hinted === 0, "rowHint call must not launch any Spark job")
    val pinned = jobsDuringConstruction(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", bands = 12, rows = 6))
    assert(pinned === 0, "pinned shape must not launch any Spark job")
    val auto = jobsDuringConstruction(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id"))
    assert(auto >= 1, "AUTO without hint sizes from a real count() job")
  }

  test("minhashPairs with rowHint or pinned shape launches no job") {
    val hinted = jobsDuringConstruction(
      Dedup.minhashPairs(docs, "text", "doc_id", rowHint = 10000L))
    assert(hinted === 0, "rowHint call must not launch any Spark job")
    val pinned = jobsDuringConstruction(
      Dedup.minhashPairs(docs, "text", "doc_id", numHashes = 64, bands = 16))
    assert(pinned === 0, "pinned shape must not launch any Spark job")
    val auto = jobsDuringConstruction(
      Dedup.minhashPairs(docs, "text", "doc_id"))
    assert(auto >= 1, "AUTO without hint sizes from a real count() job")
  }

  test("nearDupAgainstReference with refCountHint launches no job at construction") {
    import graft.streaming.Streaming
    val topic = Streaming.decodeDocuments(
      graft.sources.MessageLog.documentsTopic(spark, sf))
    topic.count() // warm the topic's listing/decode outside the window
    val hinted = jobsDuringConstruction(
      Streaming.nearDupAgainstReference(topic, topic, refCountHint = 10000L))
    assert(hinted === 0, "refCountHint call must not count the reference")
    val pinned = jobsDuringConstruction(
      Streaming.nearDupAgainstReference(topic, topic, numHashes = 64, bands = 16))
    assert(pinned === 0, "pinned shape must not launch any Spark job")
    val auto = jobsDuringConstruction(
      Streaming.nearDupAgainstReference(topic, topic))
    assert(auto >= 1, "AUTO without hint sizes from a real reference count()")
  }

  test("sq8TopK with precomputed artifacts launches no job at construction") {
    val scales = Similarity.trainSq8(emb, "embedding")
    val codes = Similarity.sq8Encode(emb, "embedding", "vec_id", scales)
    val jobs = jobsDuringConstruction(
      Similarity.sq8TopK(emb, queries, "embedding", "vec_id",
        scales = Some(scales), codes = Some(codes)))
    assert(jobs === 0)
  }

  test("ivfSqTopK with precomputed artifacts launches no job at construction") {
    val cents = Similarity.trainQuantizer(emb, "embedding", "vec_id",
      nlist = 16, iters = 1)
    val scales = Similarity.trainSq8(emb, "embedding")
    val index = Similarity.ivfSqEncode(emb, "embedding", "vec_id", cents, scales)
    val jobs = jobsDuringConstruction(
      Similarity.ivfSqTopK(emb, queries, "embedding", "vec_id",
        centroids = Some(cents), scales = Some(scales), index = Some(index)))
    assert(jobs === 0)
  }
}
