package graft

import graft.operators.Winnow
import org.apache.spark.sql.DataFrame

/** The winnowing paper's guarantees (Schleimer/Wilkerson/Aiken 2003),
  * asserted on constructed documents where each property is decidable
  * by hand, plus the corpus-level density expectation. */
class WinnowSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def fpHashes(df: DataFrame): Map[Long, Set[Long]] =
    Winnow.fingerprintsOf(df).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }

  test("density tracks the paper's 2/(w+1) expectation on the corpus") {
    val prof = Winnow.tWinnow.fn(spark, sf).collect()
    assert(prof.nonEmpty)
    val mean = prof.map(r =>
      r.getLong(3).toDouble / r.getLong(2)).sum / prof.length
    // w=4 => expected 0.4; allow a band for small-doc edge effects
    assert(mean > 0.3 && mean < 0.55, s"density mean $mean")
  }

  test("detection guarantee: a shared w+k-1 token run yields a shared fingerprint") {
    // two documents with fully distinct vocabularies except one
    // 6-token run (w+k-1 = 4+3-1 = 6) planted mid-document
    val shared = "s1 s2 s3 s4 s5 s6"
    val a = (1 to 12).map(i => s"a$i").mkString(" ") + " " + shared + " " +
      (13 to 24).map(i => s"a$i").mkString(" ")
    val b = (1 to 12).map(i => s"b$i").mkString(" ") + " " + shared + " " +
      (13 to 24).map(i => s"b$i").mkString(" ")
    val fp = fpHashes(docsOf(1L -> a, 2L -> b))
    assert((fp(1L) & fp(2L)).nonEmpty,
      "no shared fingerprint for a 6-token shared run")
  }

  test("noise floor: a shared run shorter than k yields no shared fingerprint") {
    // only a 2-token overlap (< k=3): no 3-gram is ever shared, so no
    // fingerprint can collide
    val a = (1 to 20).map(i => s"a$i").mkString(" ") + " x y " +
      (21 to 30).map(i => s"a$i").mkString(" ")
    val b = (1 to 20).map(i => s"b$i").mkString(" ") + " x y " +
      (21 to 30).map(i => s"b$i").mkString(" ")
    val fp = fpHashes(docsOf(1L -> a, 2L -> b))
    assert((fp(1L) & fp(2L)).isEmpty)
  }

  test("local selection: a prefix edit preserves most fingerprint hashes") {
    val base = (1 to 40).map(i => s"t${i * 7 % 41}x$i").mkString(" ")
    val edited = "zz0 " + base
    val fp = fpHashes(docsOf(1L -> base, 2L -> edited))
    val kept = (fp(1L) & fp(2L)).size.toDouble / fp(1L).size
    assert(kept >= 0.7, s"only $kept of fingerprints survived a 1-token prepend")
  }

  test("pair query finds the planted near-dups and nothing symmetric-noise") {
    val pairs = Winnow.dDedupWinnow.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted near-dup pairs known from DedupSpec's three-way cross-check
    assert(pairs.contains((0L, 50L)) || pairs.contains((0L, 82L)),
      s"no planted pair detected: $pairs")
    assert(pairs.forall { case (x, y) => x < y })
  }

  test("million-token documents fail loudly instead of corrupting packing") {
    val big = Array.fill(1 << 20)("tk").mkString(" ")
    val ex = intercept[Exception] {
      Winnow.fingerprintsOf(docsOf(9L -> big)).count()
    }
    assert(ex.getMessage != null)
  }
}
