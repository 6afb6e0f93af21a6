package graft.functions

import graft.plans.{HashedCharNgrams, HashedWordShingles, JaccardLong, MinHashBandKeys}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** MinHash-LSH column API, backed by codegen'd kernel expressions
  * (graft.plans.TextOps). Higher-order functions (`transform` /
  * `array_min`) are NOT whole-stage-codegen'd in Spark — a nested
  * interpreted transform made the original formulation ~100x slower —
  * so all per-document loops live in primitive kernels instead.
  *
  * sig_j(doc) = min over shingle-hashes h of ((a_j * h' + b_j) mod p),
  * the classic universal-hash family over the 61-bit Mersenne prime;
  * band key b = 64-bit fold of sig[b*rows .. b*rows+rows) with b mixed
  * in, so different bands never share keys.
  */
object MinHash {

  val prime: Long = (1L << 61) - 1

  /** Distinct hashed word k-shingles (array<long>) — MinHash input. */
  def hashedWordShingles(text: Column, k: Int): Column =
    Bridge.column(HashedWordShingles(Bridge.expression(text), k))

  /** Distinct hashed character n-grams (array<long>). */
  def hashedCharNgrams(text: Column, n: Int): Column =
    Bridge.column(HashedCharNgrams(Bridge.expression(text), n))

  /** LSH band keys (array<long> of length `bands`): docs sharing any
    * key are candidate pairs. S-curve midpoint ~ (1/bands)^(1/rows). */
  def bandKeys(hashedShingles: Column, bands: Int, rows: Int,
      seed: Long = 42L): Column =
    Bridge.column(MinHashBandKeys(Bridge.expression(hashedShingles), bands, rows, seed))

  /** Exact set Jaccard of two hashed-shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    Bridge.column(JaccardLong(Bridge.expression(a), Bridge.expression(b)))

  /** Raw MinHash signature (length `numHashes`): the sketch for
    * estimated-similarity pipelines. P(sig_j equal) = Jaccard. */
  def signature(hashedShingles: Column, numHashes: Int = 64,
      seed: Long = 42L): Column =
    Bridge.column(graft.plans.MinHashSignature(
      Bridge.expression(hashedShingles), numHashes, seed))

  /** Estimated Jaccard from two equal-length signatures: fraction of
    * equal minima. Cold path (interpreted HOF) — fine for sketch
    * comparison where the sets themselves are no longer available. */
  def estJaccard(sigA: Column, sigB: Column, numHashes: Int): Column =
    (size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b)).cast("double") / numHashes)
}
