package graft

import graft.functions.{TextFunctions => TF}
import graft.plans.{RollingFingerprint, SimHash64, TextOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.unsafe.types.UTF8String

class TextFunctionsSpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).head.get(0)
  }

  test("langId picks marker-dominant language, und on no hits") {
    assert(one("the cat and the dog is here", TF.langId(col("text"))) === "en")
    assert(one("der hund und die katze und der vogel", TF.langId(col("text"))) === "de")
    assert(one("le chat et la maison", TF.langId(col("text"))) === "fr")
    assert(one("el perro y los gatos", TF.langId(col("text"))) === "es")
    assert(one("xyzzy plugh", TF.langId(col("text"))) === "und")
  }

  test("token counts: whitespace and BPE-ish") {
    assert(one("a b  c", TF.tokenCountWs(col("text"))) === 3L)
    // "don't stop1" -> don | ' | t | stop | 1
    assert(one("don't stop1", TF.tokenCountBpe(col("text"))) === 5L)
  }

  test("shingles: distinct word trigrams") {
    val got = one("a b c d a b c d", TF.wordShingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(got.toSet === Set("a b c", "b c d", "c d a", "d a b"))
  }

  test("quality metrics bounded and deterministic") {
    val q = one("the quick brown fox jumps over the lazy dog", TF.qualityScore(col("text")))
      .asInstanceOf[Double]
    assert(q > 0.0 && q <= 1.0)
  }

  test("simhash: identical texts equal, disjoint texts differ") {
    val a = one("alpha beta gamma delta", Bridge.column(SimHash64(Bridge.expression(TF.tokens(col("text"))))))
    val b = one("alpha beta gamma delta", Bridge.column(SimHash64(Bridge.expression(TF.tokens(col("text"))))))
    val c = one("one two three four", Bridge.column(SimHash64(Bridge.expression(TF.tokens(col("text"))))))
    assert(a === b)
    assert(a !== c)
  }

  test("hashed shingle kernels agree with the string-set formulation") {
    import graft.functions.MinHash
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox leaps over the lazy dog again and again"
    // exact string-set word-trigram jaccard, computed in plain Scala
    def shingles(s: String): Set[String] =
      s.trim.toLowerCase.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val expected = shingles(a).intersect(shingles(b)).size.toDouble /
      shingles(a).union(shingles(b)).size
    import spark.implicits._
    val got = Seq((a, b)).toDF("ta", "tb")
      .select(MinHash.jaccard(
        MinHash.hashedWordShingles(col("ta"), 3),
        MinHash.hashedWordShingles(col("tb"), 3)))
      .head.getDouble(0)
    assert(got === expected)
    // char-ngram kernel: identical -> 1.0, short-text fallback works
    val same = Seq(("abcdef", "abcdef")).toDF("ta", "tb")
      .select(MinHash.jaccard(
        MinHash.hashedCharNgrams(col("ta"), 4),
        MinHash.hashedCharNgrams(col("tb"), 4))).head.getDouble(0)
    assert(same === 1.0)
    val short = Seq(("ab", "ab")).toDF("ta", "tb")
      .select(MinHash.jaccard(
        MinHash.hashedCharNgrams(col("ta"), 4),
        MinHash.hashedCharNgrams(col("tb"), 4))).head.getDouble(0)
    assert(short === 1.0)
    // band keys: deterministic, length = bands, equal sets -> equal keys
    val keys = Seq((a, a)).toDF("ta", "tb")
      .select(MinHash.bandKeys(MinHash.hashedWordShingles(col("ta"), 3), 16, 4),
        MinHash.bandKeys(MinHash.hashedWordShingles(col("tb"), 3), 16, 4))
      .head
    assert(keys.getSeq[Long](0).length === 16)
    assert(keys.getSeq[Long](0) === keys.getSeq[Long](1))
  }

  test("rolling fingerprint: equality on dup, stability on kernel") {
    assert(TextOps.rollingFingerprint(UTF8String.fromString("hello world, hello"), 8) ===
      TextOps.rollingFingerprint(UTF8String.fromString("hello world, hello"), 8))
    val x = one("some document text here", Bridge.column(
      RollingFingerprint(Bridge.expression(col("text")), 16)))
    assert(x.isInstanceOf[Long])
  }

  test("source mixing: sqrt temperature boosts small sources, rates capped") {
    import spark.implicits._
    // skewed corpus: 'big' has 16x the tokens of 'small'
    val docs = ((1L to 160L).map(i => (i, "big", "w " * 10)) ++
      (1001L to 1010L).map(i => (i, "small", "w " * 10)))
      .map { case (id, src, t) => (id, src, t.trim) }
      .toDF("doc_id", "source", "text")
    val got = operators.Pipeline.mixBySource(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val (big, small) = (got("big"), got("small"))
    // token shares: 16/17 vs 1/17; sqrt temperature compresses to 4/5 vs 1/5
    assert(small.getDouble(3) > 1.0 / 17.0, "small source must be boosted above its share")
    assert(big.getDouble(3) < 16.0 / 17.0, "big source must be damped below its share")
    assert(math.abs(big.getDouble(3) - 0.8) < 0.001)
    assert(math.abs(small.getDouble(3) - 0.2) < 0.001)
    // rates: small is upsample-capped at 1.0 (tau * tot * w / n = 0.5*1700*0.2/100 = 1.7)
    assert(small.getDouble(4) === 1.0)
    assert(big.getDouble(4) < 1.0)
    // the capped source samples every doc; the damped one fewer
    assert(small.getLong(5) === 10L)
    assert(big.getLong(5) < 160L && big.getLong(5) > 0L)
  }

  test("bloom-filtered contamination equals the exact operator; bloom never loses a member") {
    import graft.operators.Pipeline
    val exact = Pipeline.tContamination.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val bloomed = Pipeline.tContaminationBloom.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(bloomed === exact)
    // one-sidedness directly: every bench gram hash answers true
    val docs = Tables.load(spark, sf, "documents")
    val benchGrams = docs.filter(col("doc_id") < 20)
      .select(explode(graft.functions.MinHash.hashedWordShingles(col("text"), 8)).as("g"))
    val bf = benchGrams.stat.bloomFilter("g", 1L << 22, 0.01)
    benchGrams.collect().foreach { r =>
      assert(bf.mightContainLong(r.getLong(0)),
        s"bloom lost member gram ${r.getLong(0)}")
    }
  }
}
