package graft

import graft.plans.TextOps
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Seeded property tests for the primitive kernels (no Spark session:
  * kernels are plain static functions). */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(12345)
  private def arr(xs: Seq[Long]): ArrayData = ArrayData.toArrayData(xs.toArray)

  test("png codec: decode(render) recovers geometry; luma paths agree") {
    import graft.operators.PngCodec
    for (_ <- 1 to 25) {
      val (id, w, h) = (rnd.nextLong().abs % 100000,
        1 + rnd.nextInt(80), 1 + rnd.nextInt(60))
      val img = PngCodec.decode(PngCodec.render(id, w, h))
      assert(img.getWidth === w && img.getHeight === h)
      val fast = PngCodec.lumaSumMilli(img)
      // force the generic getRGB path by copying into a raster layout
      // the interleaved fast path rejects
      val argb = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      val g2 = argb.createGraphics()
      try g2.drawImage(img, 0, 0, null) finally g2.dispose()
      assert(fast === PngCodec.lumaSumMilli(argb),
        s"fast raster path must equal the ColorModel path (id=$id ${w}x$h)")
      // row-range additivity: disjoint bands sum to the whole
      val cut = 1 + rnd.nextInt(h)
      assert(PngCodec.lumaSumMilliRows(img, 0, cut) +
        PngCodec.lumaSumMilliRows(img, cut, h) === fast)
      // the rendered pattern is pure integer math on (id, x, y)
      var expected = 0L
      for (y <- 0 until h; x <- 0 until w)
        expected += 1000L * ((id * 31 + x * 7 + y * 13) % 256)
      assert(fast === expected, "decoded pixels must equal the pattern")
    }
  }

  test("jaccardLong matches the set-based definition, incl. duplicates") {
    for (_ <- 1 to 300) {
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong)
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong)
      val sa = a.toSet; val sb = b.toSet
      val expected =
        if (sa.isEmpty && sb.isEmpty) 1.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      val got = TextOps.jaccardLong(arr(a), arr(b))
      assert(got === expected, s"a=$a b=$b")
      assert(got === TextOps.jaccardLong(arr(b), arr(a)), "symmetry")
    }
  }

  test("minhashBandKeys is input-order invariant and deterministic") {
    for (_ <- 1 to 100) {
      val xs = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextLong())
      val k1 = TextOps.minhashBandKeys(arr(xs), 12, 6, 77L).toLongArray().toSeq
      val k2 = TextOps.minhashBandKeys(arr(rnd.shuffle(xs)), 12, 6, 77L).toLongArray().toSeq
      assert(k1 === k2, "order invariance")
      assert(k1.length === 12)
      // different seed -> different keys (w.h.p.)
      val k3 = TextOps.minhashBandKeys(arr(xs), 12, 6, 78L).toLongArray().toSeq
      assert(k1 !== k3)
    }
  }

  test("minhash band collision rate tracks Jaccard (S-curve sanity)") {
    // two sets with controlled overlap; high-J pairs must collide on
    // some band, disjoint sets on none
    val base = Seq.tabulate(200)(i => rnd.nextLong())
    val nearDup = base.drop(4) ++ Seq.fill(4)(rnd.nextLong()) // J ~ 0.96
    val disjoint = Seq.fill(200)(rnd.nextLong())
    def keys(xs: Seq[Long]) = TextOps.minhashBandKeys(arr(xs), 12, 6, 77L).toLongArray().toSet
    assert(keys(base).intersect(keys(nearDup)).nonEmpty, "near-dup must collide")
    assert(keys(base).intersect(keys(disjoint)).isEmpty, "disjoint must not collide")
  }

  test("signature minima estimate Jaccard within sketch error") {
    for (trial <- 1 to 20) {
      val shared = Seq.fill(100)(rnd.nextLong())
      val a = shared ++ Seq.fill(50)(rnd.nextLong())
      val b = shared ++ Seq.fill(50)(rnd.nextLong())
      val trueJ = TextOps.jaccardLong(arr(a), arr(b)) // = 0.5
      val sa = TextOps.minhashSignature(arr(a), 256, 9L).toLongArray()
      val sb = TextOps.minhashSignature(arr(b), 256, 9L).toLongArray()
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 256
      // 256 hashes -> se = sqrt(J(1-J)/256) ~ 0.031; allow 4 sigma
      assert(math.abs(est - trueJ) < 0.13, s"trial $trial est=$est true=$trueJ")
    }
  }

  test("hashedCharNgrams: cardinality bound, equality, short-text fallback") {
    for (_ <- 1 to 200) {
      val s = rnd.alphanumeric.take(rnd.nextInt(80)).mkString
      val n = rnd.nextInt(5) + 2
      val g = TextOps.hashedCharNgrams(UTF8String.fromString(s), n).toLongArray()
      if (s.length < n) assert(g.length === 1)
      else {
        assert(g.length <= s.length - n + 1 && g.length >= 1)
        assert(g.toSeq === g.toSeq.sorted && g.distinct.length === g.length)
      }
      val g2 = TextOps.hashedCharNgrams(UTF8String.fromString(s), n).toLongArray()
      assert(g.toSeq === g2.toSeq)
    }
  }

  test("hashedWordShingles equals hashing the string shingles") {
    for (_ <- 1 to 200) {
      val words = Seq.fill(rnd.nextInt(20) + 1)(
        rnd.alphanumeric.take(rnd.nextInt(6) + 1).mkString.toLowerCase)
      val text = words.mkString(" ")
      val k = rnd.nextInt(3) + 2
      val kernel = TextOps.hashedWordShingles(UTF8String.fromString(text), k)
        .toLongArray().toSet
      val viaStrings: Set[Long] =
        if (words.length < k) Set(TextOps.fnv1a16(words.mkString(" ")))
        else words.sliding(k).map(g => TextOps.fnv1a16(g.mkString(" "))).toSet
      assert(kernel === viaStrings, s"text='$text' k=$k")
    }
  }

  test("simhash: zero distance on self, <= 64 bits, token-order invariant") {
    for (_ <- 1 to 100) {
      val toks = Seq.fill(rnd.nextInt(30) + 1)(
        UTF8String.fromString(rnd.alphanumeric.take(5).mkString))
      val h1 = TextOps.simhash64(ArrayData.toArrayData(toks.toArray))
      val h2 = TextOps.simhash64(ArrayData.toArrayData(rnd.shuffle(toks).toArray))
      assert(h1 === h2, "bag-of-tokens order invariance")
    }
  }

  test("simhash128: lo word IS simhash64, order invariant, families decorrelated") {
    var agree = 0
    for (_ <- 1 to 100) {
      val toks = Seq.fill(rnd.nextInt(30) + 1)(
        UTF8String.fromString(rnd.alphanumeric.take(5).mkString))
      val s = TextOps.simhash128(ArrayData.toArrayData(toks.toArray))
      val (hi, lo) = (s.getLong(0), s.getLong(1))
      // the low family votes on the SAME fnv1a hashes as simhash64 —
      // a 128-bit run is the 64-bit signature plus an independent word,
      // never a different 64-bit signature
      assert(lo === TextOps.simhash64(ArrayData.toArrayData(toks.toArray)))
      val s2 = TextOps.simhash128(ArrayData.toArrayData(rnd.shuffle(toks).toArray))
      assert(s2.getLong(0) === hi && s2.getLong(1) === lo,
        "bag-of-tokens order invariance")
      agree += java.lang.Long.bitCount(~(hi ^ lo))
    }
    // decorrelation: each word has 64 bits, so independent vote
    // families agree on ~32 of them per doc (measured 33.3); a
    // correlated remix would sit near 64
    assert(agree > 20 * 100 && agree < 44 * 100,
      s"hi/lo bit agreement $agree out of 6400 — families look correlated")
  }

  test("cdcChunks: chunks partition the input exactly and replay the SQL boundary rule") {
    def chunks(s: String, divisor: Int = 64): Seq[String] = {
      val a = TextOps.cdcChunks(UTF8String.fromString(s), divisor)
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    // reference implementation straight off the oracle SQL: cut after
    // 1-based position i+2 when cp(i)·961+cp(i+1)·31+cp(i+2) ≡ 0 (mod d)
    def reference(s: String, divisor: Int): Seq[String] = {
      val cps = s.codePoints().toArray
      val n = cps.length
      if (n == 0) return Seq.empty
      val cuts = (0 +: (1 to math.max(n - 2, 1)).filter { i =>
        i + 2 <= n &&
          (cps(i - 1) * 961 + cps(i) * 31 + cps(i + 1)) % divisor == 0
      }.map(_ + 2) :+ n).distinct
      cuts.sliding(2).map { case Seq(a, b) =>
        new String(cps, a, b - a) }.toSeq
    }
    val alphabets = Seq(
      "abcdefgh \n\t",                       // ascii incl. whitespace
      "αβγδε ñü€",                          // BMP non-ascii
      new String(Character.toChars(0x1F600)) + "a😀b") // supplementary
    for (_ <- 1 to 200) {
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val cps = alpha.codePoints().toArray
      val n = rnd.nextInt(300)
      val sb = new StringBuilder
      for (_ <- 0 until n) sb.appendAll(Character.toChars(cps(rnd.nextInt(cps.length))))
      val s = sb.toString
      val d = Seq(4, 16, 64)(rnd.nextInt(3))
      val got = chunks(s, d)
      assert(got === reference(s, d), s"divisor=$d input=${s.take(40)}…")
      // exact partition: concatenation recovers the input byte-for-byte
      assert(got.mkString === s)
      // no empty chunks, and every boundary is content-defined:
      // re-chunking the suffix after the first cut reproduces every
      // boundary whose 3-cp hash window lies inside the suffix (the
      // windows are identical characters, so the cut decisions are too;
      // boundaries at suffix positions 1-2 straddle the removed prefix
      // and legitimately vanish)
      assert(got.forall(_.nonEmpty) || s.isEmpty)
      if (got.length >= 3) {
        val tailStr = got.drop(1).mkString
        def bounds(cs: Seq[String]): Set[Long] =
          cs.map(_.codePoints().count()).scanLeft(0L)(_ + _).drop(1).dropRight(1).toSet
        val expected = bounds(got.drop(1)).filter(_ >= 3)
        val rechunked = bounds(chunks(tailStr, d)).filter(_ >= 3)
        assert(rechunked === expected,
          "downstream cuts must be attached to content, not offsets")
      }
    }
    assert(chunks("") === Seq.empty)
    assert(chunks("ab") === Seq("ab"))
  }
}
