package graft

import org.apache.spark.sql.functions._

/** graft custom expressions registered as SQL functions via
  * SparkSessionExtensions (GraftSession wires them in). */
class ExtensionsSpec extends SparkSpec {

  test("graft functions are callable from spark.sql") {
    import spark.implicits._
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), "hello world hello"))
      .toDF("a", "b", "text").createOrReplaceTempView("ext_t")
    val r = spark.sql("""
      SELECT graft_cosine(a, b) AS cos,
             graft_dot(a, b) AS dot,
             graft_simhash64(split(text, ' ')) AS sh,
             graft_rolling_fingerprint(text, 8) AS fp,
             graft_jaccard(graft_hashed_word_shingles(text, 2),
                           graft_hashed_word_shingles(text, 2)) AS j,
             size(graft_minhash_band_keys(
                  graft_hashed_char_ngrams(text, 4), 12, 6, 77)) AS nb,
             graft_hyperplane_sig(a, 6, 1000) AS sig
      FROM ext_t""").head
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(4) === 1.0)
    assert(r.getInt(5) === 12)
  }

  test("sql and column-api results agree on the documents table") {
    val docs = Tables.load(spark, sf, "documents")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT count(DISTINCT graft_simhash64(split(lower(text), ' '))) AS s FROM ext_docs")
      .head.getLong(0)
    val viaCol = docs.select(countDistinct(org.apache.spark.sql.graft.Bridge.column(
        graft.plans.SimHash64(org.apache.spark.sql.graft.Bridge.expression(
          split(lower(col("text")), " "))))).as("s"))
      .head.getLong(0)
    assert(viaSql > 0)
    assert(viaSql === viaCol)
  }
}
