package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static text-hash kernels (see VectorOps for the codegen pattern). */
object TextOps {

  /** DEFLATE'd size of the UTF-8 bytes at the given zlib level (raw
    * stream, no zlib header). java.util.zip ships with the JVM and is
    * deterministic for a fixed input/level, so the ratio is a stable
    * per-document feature — the gzip-compressibility quality signal
    * (low ratio = templated/repetitive text, near-1 = high-entropy
    * noise; both tails are what a curation pass wants flagged). One
    * Deflater per call: the expression runs inside codegen'd
    * projections on many threads, and Deflater is not thread-safe —
    * end() releases the native buffer eagerly. */
  def deflateSize(s: UTF8String, level: Int): Long = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Unicode NFC normalization (see [[NfcNormalize]]). isNormalized
    * is the cheap quick-check scan; only rows that fail it pay the
    * String decode + compose + re-encode. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** FNV-1a 64-bit over UTF-8 bytes — stable across JVMs/executors. */
  def fnv1a(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over a token array: per-bit vote of token hashes. */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** 128-bit SimHash over a token array, returned as [hi, lo]: the
    * low 64 vote on fnv1a(token), the high 64 on its SplitMix64
    * remix — two decorrelated 64-bit families, one token hash each.
    * Doubling the signature doubles the pigeonhole block count (8 x
    * 16-bit), which is what lifts the banded verify bound from
    * n²/2^18 to n²/2^19 at TWICE the exact radius (Hamming <= 7) —
    * the documented remedy once a corpus outgrows the 64-bit path's
    * ~10M-doc bound. */
  def simhash128(tokens: ArrayData): ArrayData = {
    val counts = new Array[Int](128)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h1 = fnv1a(tokens.getUTF8String(i))
        val h2 = mix64(h1)
        var b = 0
        while (b < 64) {
          if (((h1 >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          if (((h2 >>> b) & 1L) == 1L) counts(64 + b) += 1 else counts(64 + b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var lo = 0L
    var hi = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) lo |= (1L << b)
      if (counts(64 + b) > 0) hi |= (1L << b)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(hi, lo))
  }

  /** Content-defined chunks (see [[CdcChunkStrings]]): ONE pass over
    * the string's code points. A cut lands after (1-based) position
    * i+2 whenever cp(i)·961 + cp(i+1)·31 + cp(i+2) ≡ 0 (mod divisor)
    * for i in 1..n−2 — the identical per-position rule a SQL oracle
    * replays with ascii(substring(...)) terms, but evaluated in O(n)
    * instead of the O(n²) that per-position `substring` calls cost
    * (each one re-scans the string from the start to find char i;
    * measured 208 s for the sf0.1 corpus vs ~1 s for this kernel).
    * Code points (not UTF-16 units) so `length`/`substring`/`ascii`
    * agree with both engines' character semantics on any input. The
    * max code point is 0x10FFFF, so cp·961 + cp·31 + cp < 2³¹ — the
    * 32-bit hash never overflows. */
  def cdcChunks(s: UTF8String, divisor: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val cuts = scala.collection.mutable.ArrayBuffer[Int](0)
    var i = 0
    while (i + 2 < n) {
      if ((cps(i) * 961 + cps(i + 1) * 31 + cps(i + 2)) % divisor == 0)
        cuts += (i + 3)
      i += 1
    }
    if (cuts.last != n) cuts += n
    val out = new Array[Any](cuts.length - 1)
    var j = 0
    while (j < out.length) {
      out(j) = UTF8String.fromString(
        new String(cps, cuts(j), cuts(j + 1) - cuts(j)))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** SplitMix64 finalizer: decorrelates raw shingle hashes before the
    * universal-hash minhash family is applied on top. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a over UTF-16 code units (low byte then high byte per char)
    * — the hash the shingle kernels use; exposed for verification. */
  def fnv1a16(s: String): Long = fnv1aString(s, 0, s.length)

  private def fnv1aString(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      val c = s.charAt(i).toInt
      h ^= (c & 0xffL); h *= 0x100000001b3L
      h ^= ((c >>> 8) & 0xffL); h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** In-place sort + dedup -> sorted distinct prefix copied out. */
  private def sortedDistinct(buf: Array[Long], n: Int): ArrayData = {
    java.util.Arrays.sort(buf, 0, n)
    var w = 0
    var i = 0
    while (i < n) {
      if (w == 0 || buf(i) != buf(w - 1)) { buf(w) = buf(i); w += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(buf, w))
  }

  /** Distinct hashed word `k`-shingles of lower(trim(text)), split on
    * whitespace — set-equivalent to hashing TextFunctions.wordShingles
    * (same tokens, same "w1 w2 w3" byte content) but one primitive pass.
    * Fewer than `k` tokens -> the whole token string as one shingle. */
  def hashedWordShingles(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString.trim.toLowerCase
    val toks = s.split("\\s+")
    if (toks.length < k)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(fnv1aString(toks.mkString(" "), 0, toks.mkString(" ").length)))
    val n = toks.length - k + 1
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) {
      // fnv over "tok_i tok_{i+1} ... tok_{i+k-1}" without building it
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) {
        if (j > 0) { h ^= (' '.toInt & 0xffL); h *= 0x100000001b3L; h *= 0x100000001b3L }
        val t = toks(i + j)
        var c = 0
        while (c < t.length) {
          val ch = t.charAt(c).toInt
          h ^= (ch & 0xffL); h *= 0x100000001b3L
          h ^= ((ch >>> 8) & 0xffL); h *= 0x100000001b3L
          c += 1
        }
        j += 1
      }
      buf(i) = h
      i += 1
    }
    sortedDistinct(buf, n)
  }

  /** Distinct hashed character `n`-grams of the raw string. Shorter
    * than `n` chars -> the whole string as one gram. */
  def hashedCharNgrams(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    if (s.length < n)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(fnv1aString(s, 0, s.length)))
    val m = s.length - n + 1
    val buf = new Array[Long](m)
    var i = 0
    while (i < m) { buf(i) = fnv1aString(s, i, i + n); i += 1 }
    sortedDistinct(buf, m)
  }

  /** Per-function xor keys, derived from the seed. */
  private val fnKeyCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[Long]]()
  private def fnKeysFor(numHashes: Int, seed: Long): Array[Long] =
    fnKeyCache.computeIfAbsent((numHashes, seed), { _ =>
      Array.tabulate(numHashes)(j => mix64(seed * 0x9e3779b97f4a7c15L + j))
    })

  /** MinHash-LSH band keys from a hashed-shingle set: `bands * rows`
    * signature minima (sig_j = min over shingles of mix64(h ^ key_j)),
    * folded per `rows`-slice into one 64-bit key with the band index
    * mixed in — so keys from different bands never equi-join.
    *
    * Each hash function is an independent full-width bijection of the
    * shingle hash. A universal family ((a*h'+b) mod p) over a domain
    * much narrower than p is NOT usable here: products wrap mod p at
    * most once, so the minimum is often the gram with the globally
    * smallest h' — the SAME gram for every j — and signatures collapse
    * (measured: 9 of 12 bands sharing one 2538-doc bucket).
    *
    * One primitive pass per document: O(shingles x numHashes) mixes,
    * no allocation beyond the output array. */
  def minhashBandKeys(hashes: ArrayData, bands: Int, rows: Int, seed: Long): ArrayData = {
    val numHashes = bands * rows
    val keysJ = fnKeysFor(numHashes, seed)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = mix64(h ^ keysJ(j))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b
      var r = 0
      while (r < rows) { h = (h ^ sig(b * rows + r)) * 0x100000001b3L; r += 1 }
      keys(b) = mix64(h)
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(keys)
  }

  /** Raw MinHash signature (the minima themselves, not band keys):
    * sig_j = min over shingle-hashes of mix64(h ^ key_j). Basis for
    * sketch-based similarity estimation — P(sig_j equal) = Jaccard. */
  def minhashSignature(hashes: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val keysJ = fnKeysFor(numHashes, seed)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = mix64(h ^ keysJ(j))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sig)
  }

  /** Exact Jaccard of two long-array sets (sorts local copies, then a
    * single merge — no hash set, no per-element boxing). */
  def jaccardLong(a: ArrayData, b: ArrayData): Double = {
    val x = a.toLongArray(); val y = b.toLongArray()
    java.util.Arrays.sort(x); java.util.Arrays.sort(y)
    var i = 0; var j = 0; var inter = 0; var union = 0
    while (i < x.length && j < y.length) {
      // count each distinct value once even if an input had duplicates
      val c = java.lang.Long.compare(x(i), y(j))
      if (c == 0) {
        val v = x(i); inter += 1; union += 1
        while (i < x.length && x(i) == v) i += 1
        while (j < y.length && y(j) == v) j += 1
      } else if (c < 0) {
        val v = x(i); union += 1
        while (i < x.length && x(i) == v) i += 1
      } else {
        val v = y(j); union += 1
        while (j < y.length && y(j) == v) j += 1
      }
    }
    while (i < x.length) { val v = x(i); union += 1; while (i < x.length && x(i) == v) i += 1 }
    while (j < y.length) { val v = y(j); union += 1; while (j < y.length && y(j) == v) j += 1 }
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Winnowing-style document fingerprint: minimum Karp-Rabin rolling
    * hash over all `k`-byte windows (equal documents -> equal
    * fingerprint; appended/prefixed variants usually keep it).
    */
  def rollingFingerprint(s: UTF8String, k: Int): Long = {
    val bytes = s.getBytes
    if (bytes.length < k) return fnv1a(s)
    val B = 1000000007L
    // precompute B^(k-1) without overflow concerns (wrapping is fine,
    // both add and remove use the same wrapped factor)
    var bk = 1L
    var j = 0
    while (j < k - 1) { bk *= B; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    var min = h
    while (i < bytes.length) {
      h = (h - (bytes(i - k) & 0xffL) * bk) * B + (bytes(i) & 0xffL)
      if (h < min) min = h
      i += 1
    }
    min
  }
}

/** simhash64(array<string>) -> long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash64"
  override protected def nullSafeEval(v: Any): Any =
    TextOps.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextOps.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** simhash128(array<string>) -> array<long> [hi, lo]. */
case class SimHash128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash128"
  override protected def nullSafeEval(v: Any): Any =
    TextOps.simhash128(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextOps.simhash128($c)")
  override protected def withNewChildInternal(c: Expression): SimHash128 = copy(child = c)
}

/** hashed_word_shingles(string, k) -> array<long> (sorted distinct). */
case class HashedWordShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hashed_word_shingles"
  override protected def nullSafeEval(v: Any): Any =
    TextOps.hashedWordShingles(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextOps.hashedWordShingles($c, $k)")
  override protected def withNewChildInternal(c: Expression): HashedWordShingles = copy(child = c)
}

/** hashed_char_ngrams(string, n) -> array<long> (sorted distinct). */
case class HashedCharNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hashed_char_ngrams"
  override protected def nullSafeEval(v: Any): Any =
    TextOps.hashedCharNgrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextOps.hashedCharNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): HashedCharNgrams = copy(child = c)
}

/** cdc_chunks(string, divisor) -> array<string>: content-defined
  * chunking in one pass (see [[TextOps.cdcChunks]] for the boundary
  * rule and why the kernel exists — the same rule as a per-position
  * column expression is quadratic in document length). */
case class CdcChunkStrings(child: Expression, divisor: Int) extends UnaryExpression {
  require(divisor > 0, "graft_cdc_chunks: divisor must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cdc_chunks"
  override protected def nullSafeEval(v: Any): Any =
    TextOps.cdcChunks(v.asInstanceOf[UTF8String], divisor)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextOps.cdcChunks($c, $divisor)")
  override protected def withNewChildInternal(c: Expression): CdcChunkStrings = copy(child = c)
}

/** minhash_band_keys(array<long>, bands, rows, seed) -> array<long>. */
case class MinHashBandKeys(child: Expression, bands: Int, rows: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_band_keys"
  override protected def nullSafeEval(v: Any): Any =
    TextOps.minhashBandKeys(v.asInstanceOf[ArrayData], bands, rows, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextOps.minhashBandKeys($c, $bands, $rows, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashBandKeys = copy(child = c)
}

/** minhash_signature(array<long>, n, seed) -> array<long> minima. */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_signature"
  override protected def nullSafeEval(v: Any): Any =
    TextOps.minhashSignature(v.asInstanceOf[ArrayData], numHashes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextOps.minhashSignature($c, $numHashes, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** jaccard(array<long>, array<long>) -> double, exact set Jaccard. */
case class JaccardLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextOps.jaccardLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.TextOps.jaccardLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardLong =
    copy(left = l, right = r)
}

/** deflate_size(string) -> long (raw-DEFLATE byte count at `level`). */
case class DeflateSize(child: Expression, level: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_deflate_size"
  override protected def nullSafeEval(v: Any): Any =
    TextOps.deflateSize(v.asInstanceOf[UTF8String], level)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextOps.deflateSize($c, $level)")
  override protected def withNewChildInternal(c: Expression): DeflateSize = copy(child = c)
}

/** nfc_normalize(string) -> string: Unicode NFC (canonical
  * composition, UAX #15) via the JDK's ICU-derived
  * java.text.Normalizer — combining sequences compose to their
  * precomposed forms, so byte-different but canonically-equal texts
  * hash/dedup identically downstream. Quick-check fast path: NFC-clean
  * input (the overwhelmingly common case for real corpora) returns
  * the original UTF8String with ZERO allocation — the String
  * round-trip only happens on rows that actually need composing. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc_normalize"
  override protected def nullSafeEval(v: Any): Any =
    TextOps.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextOps.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
}

/** rolling_fingerprint(string) -> long (window of `k` bytes). */
case class RollingFingerprint(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rolling_fingerprint"
  override protected def nullSafeEval(v: Any): Any =
    TextOps.rollingFingerprint(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextOps.rollingFingerprint($c, $k)")
  override protected def withNewChildInternal(c: Expression): RollingFingerprint = copy(child = c)
}

/** bloom_might_contain(long) -> boolean against a broadcast
  * [[org.apache.spark.util.sketch.BloomFilter]] — the memory-viable
  * membership probe when the reference set outgrows a broadcast hash
  * join (a 10M-gram benchmark suite is ~hundreds of MB as a join
  * relation, ~12 MB as a 1% bloom). One-sided by construction: false
  * NEVER occurs for a member (no lost hits), true may be a false
  * positive — callers verify candidates with an exact join downstream,
  * which then shuffles only the pruned candidate rows. */
case class BloomMightContain(child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bloom_might_contain"
  @transient private lazy val bf: org.apache.spark.util.sketch.BloomFilter = bloom.value
  def kernel(h: Long): Boolean = bf.mightContainLong(h)
  override protected def nullSafeEval(h: Any): Any = kernel(h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

/** bloom_count_contained(array<long>) -> int: how many of a document's
  * gram hashes the broadcast bloom admits — ONE kernel pass per
  * document (no explode, no higher-order function), so a streaming
  * decontamination pass can route clean documents (count = 0, the
  * overwhelming majority) past the verify join entirely. */
case class BloomCountContained(child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bloom_count_contained"
  @transient private lazy val bf: org.apache.spark.util.sketch.BloomFilter = bloom.value
  def kernel(hs: ArrayData): Int = {
    var n = 0
    var i = 0
    val len = hs.numElements()
    while (i < len) {
      if (bf.mightContainLong(hs.getLong(i))) n += 1
      i += 1
    }
    n
  }
  override protected def nullSafeEval(hs: Any): Any =
    kernel(hs.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomCountContained", this,
      classOf[BloomCountContained].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }
  override protected def withNewChildInternal(c: Expression): BloomCountContained =
    copy(child = c)
}
