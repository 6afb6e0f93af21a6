package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash signatures via codegen'd higher-order functions: no UDFs,
  * no row explosion — one `transform`/`array_min` pass per document.
  *
  * sig_i(doc) = min over shingles s of ((a_i * x64(s) + b_i) mod p),
  * the classic universal-hash family over a 61-bit Mersenne prime.
  */
object MinHash {

  val prime: Long = (1L << 61) - 1

  /** Base-hash domain: 31 bits, so a_i * h stays under 2^62 and never
    * overflows a long under ANSI arithmetic. */
  val hashDomain: Long = 1L << 31

  /** Deterministic (a_i, b_i) coefficient pairs, seed-fixed, < 2^31. */
  def coefficients(numHashes: Int, seed: Long = 42L): (Seq[Long], Seq[Long]) = {
    val rnd = new java.util.Random(seed)
    def next(): Long = { val v = rnd.nextLong() % (hashDomain - 1); math.abs(v) + 1 }
    (Seq.fill(numHashes)(next()), Seq.fill(numHashes)(next()))
  }

  /** array<long> signature of length `numHashes` for a shingle array. */
  def signature(shingles: Column, numHashes: Int = 64): Column = {
    val (as, bs) = coefficients(numHashes)
    val aCol = typedLit(as)
    val bCol = typedLit(bs)
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(shingles, s =>
        pmod(element_at(aCol, i + lit(1)) * pmod(xxhash64(s), lit(hashDomain)) +
          element_at(bCol, i + lit(1)), lit(prime)))))
  }

  /** LSH band keys: `bands` hashes, each over `rows`-long signature
    * slices. Docs sharing any (band, key) are candidate pairs. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"), xxhash64(b, array_join(slice(sig, b * lit(rows) + lit(1), lit(rows)), ",")).as("bkey")))

  /** Estimated Jaccard from two signatures: fraction of equal minima. */
  def estJaccard(sigA: Column, sigB: Column, numHashes: Int): Column =
    (size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b)).cast("double") / numHashes)
}
