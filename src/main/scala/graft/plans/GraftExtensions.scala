package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers every graft custom
  * expression as a SQL function, so `spark.sql` users get the same
  * surface as the Column API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT graft_cosine(a.embedding, b.embedding) ...")
  * }}}
  *
  * Also usable via spark.sql.extensions=graft.plans.GraftExtensions on
  * an unmodified spark-submit.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def longArg(e: Expression, fn: String, pos: Int): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a long literal, got $other")
  }

  private def fns: Seq[(String, FunctionBuilder)] = Seq(
    "graft_dot" -> { args => DotF(args(0), args(1)) },
    "graft_cosine" -> { args => CosineSim(args(0), args(1)) },
    "graft_hyperplane_sig" -> { args =>
      HyperplaneSig(args(0), intArg(args(1), "graft_hyperplane_sig", 1),
        longArg(args(2), "graft_hyperplane_sig", 2)) },
    "graft_simhash64" -> { args => SimHash64(args(0)) },
    "graft_rolling_fingerprint" -> { args =>
      RollingFingerprint(args(0), intArg(args(1), "graft_rolling_fingerprint", 1)) },
    "graft_hashed_word_shingles" -> { args =>
      HashedWordShingles(args(0), intArg(args(1), "graft_hashed_word_shingles", 1)) },
    "graft_hashed_char_ngrams" -> { args =>
      HashedCharNgrams(args(0), intArg(args(1), "graft_hashed_char_ngrams", 1)) },
    "graft_cdc_chunks" -> { args =>
      CdcChunkStrings(args(0), intArg(args(1), "graft_cdc_chunks", 1)) },
    "graft_minhash_signature" -> { args =>
      MinHashSignature(args(0), intArg(args(1), "graft_minhash_signature", 1),
        longArg(args(2), "graft_minhash_signature", 2)) },
    "graft_minhash_band_keys" -> { args =>
      MinHashBandKeys(args(0), intArg(args(1), "graft_minhash_band_keys", 1),
        intArg(args(2), "graft_minhash_band_keys", 2),
        longArg(args(3), "graft_minhash_band_keys", 3)) },
    "graft_jaccard" -> { args => JaccardLong(args(0), args(1)) })

  override def apply(ext: SparkSessionExtensions): Unit = {
    fns.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // projection pruning through Avro decode (see AvroProjectionPruning)
    ext.injectOptimizerRule(_ => AvroProjectionPruning)
  }
}
