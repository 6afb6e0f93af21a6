package graft.operators

import graft.functions.{TextFunctions => TF}
import graft.plans.{BroadcastCentroids, CdcChunkStrings, CentroidCosines, CosineSim, HashedCharNgrams, HashedWordShingles, HyperplaneSig, JaccardLong, MinHashBandKeys, SimHash128, SimHash64, TopProbeCells}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Deduplication operators for training-data curation, each designed
  * around one shuffle-bounded candidate-generation strategy — never an
  * O(n^2) cross product:
  *
  *  - exact:   one hash-partitioned group-by on content hash.
  *  - minhash: LSH banding — candidates share a (band, bandkey)
  *    bucket; shuffle cardinality is rows x bands, pairs only form
  *    inside buckets (tunable precision/recall via bands x rows).
  *  - simhash: 64-bit signature, banded into 4 x 16-bit sub-keys;
  *    Hamming-<=3 pairs must collide on at least one sub-key
  *    (pigeonhole), then verified with bit_count(xor).
  *  - ngram:   steep-S-curve minhash-LSH blocking (sized for the high
  *    background Jaccard of shared-vocabulary char n-grams), then
  *    exact n-gram Jaccard on candidates only.
  *  - embedding: random-hyperplane LSH buckets, cosine-verified.
  *  - clusters: connected components over any pair list (alternating
  *    large-star/small-star contraction), for keep-one-per-cluster
  *    dedup.
  *
  * At 100 TB each strategy's shuffle is linear in input (+bucket
  * fanout); skew from hot buckets is handled by AQE skew-join. All
  * per-document hashing runs in codegen'd kernels (graft.plans).
  */
object Dedup {

  private def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  /** Content-hash dedup: flags every row whose exact text appeared
    * on a lower id. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = md5(col(textCol))
    val w = Window.partitionBy(h).orderBy(col(idCol))
    df.select(col(idCol), h.as("content_hash"),
      (row_number().over(w) > 1).as("is_dup"))
  }

  /** LSH blocking + exact-Jaccard verification shared by the minhash
    * and ngram dedup paths. `sh` must be (id, sh: array<long>) — the
    * hashed shingle/gram set. All heavy per-document work is a single
    * codegen'd kernel call; band keys already encode the band index,
    * so the candidate join is a one-key equi-join. */
  private def lshJaccardPairs(sh: DataFrame, bands: Int, rows: Int,
      threshold: Double, seed: Long): DataFrame = {
    val banded = sh.select(col("id"),
      explode(Bridge.column(MinHashBandKeys(
        Bridge.expression(col("sh")), bands, rows, seed))).as("bkey"))
    val cand = banded.as("l")
      .join(banded.as("r"),
        col("l.bkey") === col("r.bkey") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(Bridge.column(JaccardLong(
          Bridge.expression(col("sh_a")), Bridge.expression(col("sh_b")))), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification.
    * Returns (id_a, id_b, jaccard) for word-shingle Jaccard >=
    * `threshold`. The legacy 16 bands x 4 rows put the S-curve
    * midpoint at (1/16)^(1/4) = 0.5 = the default threshold.
    *
    * `numHashes`/`bands` default to AUTO (-1): the same fixed-S-curve
    * background term as [[ngramJaccardPairs]] — candidates ≈ bands ·
    * J_bg^rows · n²/2, quadratic at any constant shape; word-shingle
    * background between unrelated docs is low (~0.05-0.1, why the
    * fixed 16x4 measured ~linear to 100x on this corpus) but the term
    * only takes a bigger n to surface. [[autoMinhashRows]] steepens
    * rows with corpus count (n · J_bg^rows <= ~64 per band at the
    * J_bg = 0.15 design background), [[autoMinhashBands]] re-solves
    * bands for >= 0.999 recall at the J = 0.8 near-dup design point,
    * and numHashes = bands · rows. Steepening raises the midpoint
    * above `threshold`, so borderline pairs (J just over threshold)
    * lose recall while the near-dup design point holds — the same
    * documented trade as the ngram and embedding AUTO paths. At the
    * test corpus sizes AUTO resolves to exactly the legacy 64/16.
    * AUTO costs one count() UNLESS `rowHint` (> 0) supplies the row
    * count; pass numHashes AND bands together to pin a shape (the
    * oracled contract queries do — pinning one half is rejected). */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, numHashes: Int = -1, bands: Int = -1,
      threshold: Double = 0.5, seed: Long = 42L,
      rowHint: Long = -1L): DataFrame = {
    val (b, r) = resolveMinhashShape(numHashes, bands, rowHint, df.count())
    val sh = df.select(col(idCol).as("id"),
      Bridge.column(HashedWordShingles(
        Bridge.expression(col(textCol)), shingleK)).as("sh"))
    lshJaccardPairs(sh, b, r, threshold, seed)
  }

  /** Incremental (delta) dedup: near-dup pairs BETWEEN two corpora —
    * `incoming` screened against `reference` — without ever forming
    * within-side pairs. The production shape for "dedup today's crawl
    * against the accumulated corpus": the reference side's banded
    * keys are computed once per run (on a cluster, persist or bucket
    * them by `bkey` across runs), the incoming batch blocks against
    * them with one equi-join, candidates are DISTINCT'd before the
    * exact-Jaccard verify joins the two shingle sets back. Returns
    * (doc_id, ref_id, jaccard) directed incoming → reference at
    * word-`shingleK`-shingle Jaccard >= `threshold`.
    *
    * Banding shape follows the REFERENCE corpus size (the big,
    * growing side — same convention as the streaming reference join):
    * AUTO via [[resolveMinhashShape]] unless pinned whole, count
    * skipped when `refCountHint` > 0. The batch sibling of
    * [[graft.streaming.Streaming.nearDupAgainstReference]]. */
  def crossCorpusPairs(incoming: DataFrame, reference: DataFrame,
      textCol: String, idCol: String, shingleK: Int = 3,
      numHashes: Int = -1, bands: Int = -1, threshold: Double = 0.5,
      seed: Long = 42L, refCountHint: Long = -1L): DataFrame = {
    val (b, r) = resolveMinhashShape(numHashes, bands, refCountHint,
      reference.count())
    def shingled(df: DataFrame, idOut: String, shOut: String) =
      df.select(col(idCol).as(idOut),
        Bridge.column(HashedWordShingles(
          Bridge.expression(col(textCol)), shingleK)).as(shOut))
    val shIn = shingled(incoming, "doc_id", "sh_s")
    val shRef = shingled(reference, "ref_id", "sh_r")
    def banded(sh: DataFrame, id: String, shCol: String) =
      sh.select(col(id), explode(Bridge.column(MinHashBandKeys(
        Bridge.expression(col(shCol)), b, r, seed))).as("bkey"))
    directedVerify(
      banded(shIn, "doc_id", "sh_s")
        .join(banded(shRef, "ref_id", "sh_r"), "bkey"),
      shIn, shRef, threshold)
  }

  /** Shared candidate → verified tail of the cross-corpus paths
    * ([[crossCorpusPairs]], [[crossCorpusPairsStored]]): DISTINCT the
    * directed candidate id-pairs, join both shingle sets back, keep
    * round(Jaccard, 4) >= threshold — the rounding-then-threshold
    * order is load-bearing (it must match the oracle's, see the
    * shinglePairsSql comment in [[Pipeline]]), so it lives in exactly
    * one place. */
  private def directedVerify(cand: DataFrame, shIn: DataFrame,
      shRef: DataFrame, threshold: Double): DataFrame =
    cand
      .filter(col("doc_id") =!= col("ref_id"))
      .select(col("doc_id"), col("ref_id"))
      .distinct()
      .join(shIn, "doc_id")
      .join(shRef, "ref_id")
      .select(col("doc_id"), col("ref_id"),
        round(Bridge.column(JaccardLong(
          Bridge.expression(col("sh_s")), Bridge.expression(col("sh_r")))), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Column-metadata key carrying the banding shape a signature store
    * was built with — (shingleK, bands, rows, seed) — so a delta run
    * always reuses the STORE's shape instead of trusting the caller
    * to re-specify it identically. */
  private[graft] val SignatureShapeKey = "graft.sigstore.shape"

  /** Materialized MinHash signature store for the accumulated
    * reference corpus: (ref_id, sh, bkeys) — hashed shingle set plus
    * pre-computed band keys. THE incremental-dedup artifact at 100 TB:
    * the reference side's shingling and banding run ONCE when a batch
    * is admitted (append the new rows to the store), and every later
    * [[crossCorpusPairsStored]] delta run reads the store instead of
    * re-hashing petabytes of text. Write it partitioned/bucketed by
    * `bkey` after exploding if the delta join becomes shuffle-bound;
    * the banding shape travels IN the `bkeys` column metadata (parquet
    * round-trips field metadata), so a store can never be probed with
    * a mismatched shape. */
  def signatureStore(reference: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, numHashes: Int = -1, bands: Int = -1,
      seed: Long = 42L, rowHint: Long = -1L): DataFrame = {
    val (b, r) = resolveMinhashShape(numHashes, bands, rowHint,
      reference.count())
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(SignatureShapeKey, s"$shingleK,$b,$r,$seed").build()
    val sh = Bridge.column(HashedWordShingles(
      Bridge.expression(col(textCol)), shingleK))
    reference.select(col(idCol).as("ref_id"), sh.as("sh"))
      .select(col("ref_id"), col("sh"),
        Bridge.column(MinHashBandKeys(
          Bridge.expression(col("sh")), b, r, seed)).as("bkeys", meta))
  }

  /** [[crossCorpusPairs]] against a materialized [[signatureStore]]:
    * the incoming batch is shingled and banded AT THE STORE'S OWN
    * SHAPE (read from the `bkeys` column metadata — a store written
    * without it is rejected loudly), so reference text is never
    * re-read and shape drift between store build and delta run is
    * impossible by construction. Same output contract as
    * [[crossCorpusPairs]]: (doc_id, ref_id, jaccard) directed
    * incoming → reference. */
  /** Parse (shingleK, bands, rows, seed) out of a [[signatureStore]]'s
    * column metadata — the ONLY sanctioned way to learn a store's
    * shape (a bare store is rejected loudly, never probed with a
    * guessed shape). Shared by the batch ([[crossCorpusPairsStored]])
    * and streaming ([[graft.streaming.Streaming.nearDupAgainstStore]])
    * probe paths. */
  private[graft] def storeShape(store: DataFrame): (Int, Int, Int, Long) = {
    val field = store.schema.find(_.name == "bkeys").getOrElse(
      throw new IllegalArgumentException(
        "graft: signature store needs a bkeys column (see Dedup.signatureStore)"))
    require(field.metadata.contains(SignatureShapeKey),
      "graft: signature store carries no banding-shape metadata — " +
        "rebuild it with Dedup.signatureStore, or the delta join would " +
        "silently probe with a mismatched shape")
    val Array(shingleK, b, r, seed) =
      field.metadata.getString(SignatureShapeKey).split(",")
    (shingleK.toInt, b.toInt, r.toInt, seed.toLong)
  }

  def crossCorpusPairsStored(incoming: DataFrame, store: DataFrame,
      textCol: String, idCol: String,
      threshold: Double = 0.5): DataFrame = {
    val (shingleK, b, r, seed) = storeShape(store)
    val shIn = incoming.select(col(idCol).as("doc_id"),
      Bridge.column(HashedWordShingles(
        Bridge.expression(col(textCol)), shingleK)).as("sh_s"))
    val bIn = shIn.select(col("doc_id"),
      explode(Bridge.column(MinHashBandKeys(
        Bridge.expression(col("sh_s")), b, r, seed)))
        .as("bkey"))
    val bRef = store.select(col("ref_id"), explode(col("bkeys")).as("bkey"))
    directedVerify(bIn.join(bRef, "bkey"), shIn,
      store.select(col("ref_id"), col("sh").as("sh_r")), threshold)
  }

  /** Shared numHashes/bands resolution for the minhash-family
    * blockings ([[minhashPairs]] and the streaming reference join):
    * pinned-or-AUTO with every invalid quadrant rejected in ONE place.
    * Half-pins break the invariant the other half was sized for; a
    * non-divisible pin silently runs a different shape than the caller
    * named; and numHashes < bands gives rows = 0, which folds ZERO
    * minima into every band key — every document lands in one bucket
    * per band and the candidate self-join is the full n²/2 cross
    * product. `count` is by-name: only evaluated on the AUTO path
    * without a hint. */
  private[graft] def resolveMinhashShape(numHashes: Int, bands: Int,
      rowHint: Long, count: => Long): (Int, Int) = {
    require((numHashes > 0) == (bands > 0),
      s"graft: pass numHashes AND bands together (got numHashes=$numHashes, " +
        s"bands=$bands) — pinning one half of the S-curve silently breaks " +
        "the recall or occupancy invariant the other half was sized for")
    if (bands > 0) {
      require(numHashes % bands == 0 && numHashes >= bands,
        s"graft: numHashes ($numHashes) must be a positive multiple of " +
          s"bands ($bands) — rows = numHashes/bands must be >= 1, and a " +
          "remainder would silently drop hashes from the pinned shape")
      (bands, numHashes / bands)
    } else {
      val r = autoMinhashRows(if (rowHint > 0) rowHint else count)
      (autoMinhashBands(r), r)
    }
  }

  /** Occupancy-held S-curve steepness for [[minhashPairs]]: smallest
    * rows-per-band with expected background collisions per (document,
    * band) bounded — n · J_bg^rows <= ~64 at the word-shingle design
    * background J_bg = 0.15 — clamped to [4, 12] (4 = the legacy
    * shape, which AUTO reproduces up to ~126k docs). */
  private[graft] def autoMinhashRows(n: Long, jBg: Double = 0.15): Int =
    math.min(12, math.max(4,
      math.ceil(math.log(math.max(n, 1L) / 64.0) / math.log(1.0 / jBg)).toInt))

  /** Recall-restoring band count for [[minhashPairs]]: bands grows
    * with steeper rows to keep >= 0.999 recall at the J = 0.8
    * near-dup design point, clamped to >= 16 (the legacy floor). */
  private[graft] def autoMinhashBands(rows: Int, jTrue: Double = 0.8,
      recall: Double = 0.999): Int =
    math.max(16,
      math.ceil(math.log(1.0 - recall) /
        math.log(1.0 - math.pow(jTrue, rows))).toInt)

  /** SimHash near-dup pairs: (id_a, id_b, hamming) with Hamming
    * distance <= `maxHamming` over token-vote signatures of `bits`
    * (64 or 128) bits.
    *
    * Scale bound, by construction: the pigeonhole guarantee (any
    * within-radius pair shares one intact 16-bit block) fixes the
    * block count at bits/16, so unlike the tunable LSH paths this
    * blocking cannot steepen with corpus size — bucket occupancy is
    * n/2^16 per band and the verify term grows ~bands²·n²/2^(16+...).
    * The 64-bit default (4 blocks, exact Hamming <= 3, verify term
    * n²/2^18) is fine to ~10M docs (occupancy ~150, measured 6.5x
    * wall at the 100x/500k-doc probe); past that, `bits = 128`
    * ([[graft.plans.SimHash128]]: two decorrelated 64-bit vote
    * families) is the documented remedy — 8 x 16-bit blocks give
    * exact recall at TWICE the radius (Hamming <= 7) while the
    * verify constant grows only 2x (8²/2 vs 4²/2 band pairings on
    * the same 2^16 key space), and a same-radius run (maxHamming <= 3
    * still allowed) simply verifies fewer false candidates per block
    * because 128-bit signatures decorrelate harder. Not a
    * recall-losing bucket cap in either shape. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, bits: Int = 64): DataFrame = {
    require(bits == 64 || bits == 128,
      s"simhashPairs: bits must be 64 or 128, got $bits")
    val blocks = bits / 16
    require(maxHamming >= 0 && maxHamming < blocks,
      s"simhashPairs: pigeonhole exactness needs maxHamming < $blocks " +
        s"(= bits/16) at bits=$bits, got $maxHamming — raise bits, don't " +
        "stretch the radius past the guarantee")
    val toks = Bridge.expression(TF.tokens(col(textCol)))
    if (bits == 64) {
      val sig = df.select(col(idCol).as("id"),
        Bridge.column(SimHash64(toks)).as("sig"))
      // 4 sub-keys of 16 bits: any pair within Hamming 3 shares one intact
      val banded = sig.select(col("id"), col("sig"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("sig"), b * 16).bitwiseAND(0xffffL).as("bkey"))): _*)).as("bk"))
        .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      bandedHammingPairs(banded, maxHamming,
        (l, r) => bit_count(col(s"$l.sig").bitwiseXOR(col(s"$r.sig"))))
    } else {
      // [hi, lo] signature; 8 sub-keys of 16 bits — bands 0-3 slice lo,
      // 4-7 slice hi, so any pair within Hamming 7 shares one intact
      val sig = df.select(col(idCol).as("id"),
          Bridge.column(SimHash128(toks)).as("s"))
        .select(col("id"), col("s").getItem(0).as("hi"), col("s").getItem(1).as("lo"))
      val banded = sig.select(col("id"), col("hi"), col("lo"),
        explode(array((0 until 8).map { b =>
          val word = if (b < 4) col("lo") else col("hi")
          struct(lit(b).as("band"),
            shiftrightunsigned(word, (b % 4) * 16).bitwiseAND(0xffffL).as("bkey"))
        }: _*)).as("bk"))
        .select(col("id"), col("hi"), col("lo"),
          col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      bandedHammingPairs(banded, maxHamming,
        (l, r) => bit_count(col(s"$l.hi").bitwiseXOR(col(s"$r.hi"))) +
          bit_count(col(s"$l.lo").bitwiseXOR(col(s"$r.lo"))))
    }
  }

  /** The shared verify half of both simhash widths: candidate pairs
    * from the (band, bkey) self-join, exact Hamming from the signature
    * columns riding alongside, DISTINCT'd before the radius filter —
    * one implementation so join plumbing (orientation, dedup
    * placement, a future skew hint) can't drift between widths. */
  private[operators] def bandedHammingPairs(banded: DataFrame, maxHamming: Int,
      hamming: (String, String) => Column): DataFrame =
    banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming("l", "r").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)

  /** Exact character-n-gram Jaccard pairs, MinHash-LSH blocked.
    * Character n-grams over a shared vocabulary give unrelated docs a
    * high background Jaccard (~0.3 on the synthetic corpus), so the
    * blocking needs a steep S-curve: 12 bands x 6 rows puts the
    * midpoint at (1/12)^(1/6) = 0.66 — near-zero candidates from the
    * 0.3 background, >0.997 recall for true near-dups (J >= 0.9).
    * A single-min-gram block (the naive choice) degenerates here: the
    * globally-cheapest common gram forms one mega-block whose pair
    * count grows quadratically with corpus size.
    *
    * `bands`/`rows` default to AUTO (-1): a FIXED S-curve has a
    * background-collision candidate term p·n²/2 with p ≈ bands ·
    * J_bg^rows — constant per pair, so quadratic in corpus size (the
    * 100x probe surfaced it as a disk-filling shuffle; at the design
    * background it is ~0.9% of all pairs). [[autoNgramRows]] steepens
    * the curve with n — smallest `rows` holding EXPECTED background
    * collisions per (document, band) at n · J_bg^rows <= ~64, the
    * same occupancy constant as [[autoBits]] — and [[autoNgramBands]]
    * then re-sizes `bands` to hold >= 0.999 recall at the J = 0.9
    * near-dup point. Steepening trades map-side hashes (bands x rows
    * grows ~log n) for candidate volume held ~linear — the right side
    * of the trade at every scale. AUTO costs one count() UNLESS
    * `rowHint` (> 0) supplies the row count (NoHiddenScanSpec); at
    * the test corpus sizes AUTO resolves to exactly the legacy 12x6,
    * so the oracled contract runs the default path. Pass both
    * explicitly to pin a shape. The design background J_bg = 0.35
    * covers the measured ~0.3 with margin; a corpus hotter than that
    * (the 100x replica's marker-diluted cross-copy grams sit at ~0.55)
    * needs explicit steeper rows — the term is in the DATA, and no
    * banding constant is safe for every background. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 4, threshold: Double = 0.7, bands: Int = -1, rows: Int = -1,
      seed: Long = 77L, rowHint: Long = -1L): DataFrame = {
    // pinning only bands would silently pair them with auto-steepened
    // rows and drop recall below the 0.999 design point; pinning only
    // rows would skip the recall-restoring band resolve — a shape is
    // pinned whole or sized whole
    require((bands > 0) == (rows > 0),
      s"graft: pass bands AND rows together (got bands=$bands, rows=$rows) " +
        "— pinning one half of the S-curve silently breaks the recall or " +
        "occupancy invariant the other half was sized for")
    val r = if (rows > 0) rows
            else autoNgramRows(if (rowHint > 0) rowHint else df.count())
    val b = if (bands > 0) bands else autoNgramBands(r)
    val grams = df.select(col(idCol).as("id"),
      Bridge.column(HashedCharNgrams(
        Bridge.expression(col(textCol)), n)).as("sh"))
    lshJaccardPairs(grams, b, r, threshold, seed)
  }

  /** Occupancy-held S-curve steepness for [[ngramJaccardPairs]]:
    * smallest rows-per-band with expected background collisions per
    * (document, band) bounded — n · J_bg^rows <= ~64 at the design
    * background J_bg = 0.35 — clamped to [6, 16]. Holds the candidate
    * volume ~64 · bands · n / 2, linear, where fixed rows leave it
    * bands · J_bg^rows · n²/2, quadratic. */
  private[graft] def autoNgramRows(n: Long, jBg: Double = 0.35): Int =
    math.min(16, math.max(6,
      math.ceil(math.log(math.max(n, 1L) / 64.0) / math.log(1.0 / jBg)).toInt))

  /** Recall-restoring band count for [[ngramJaccardPairs]]: steeper
    * rows cut per-band collision for TRUE pairs too, so bands grows to
    * keep >= 0.999 recall at the J = 0.9 near-dup point —
    * 1 - (1 - 0.9^rows)^bands >= 0.999 — clamped to >= 12 (the legacy
    * floor, which at rows = 6 is also what the formula's 10 rounds up
    * to at the test corpus sizes). */
  private[graft] def autoNgramBands(rows: Int, jTrue: Double = 0.9,
      recall: Double = 0.999): Int =
    math.max(12,
      math.ceil(math.log(1.0 - recall) /
        math.log(1.0 - math.pow(jTrue, rows))).toInt)

  /** Connected components over a near-dup pair list: every id that
    * appears in `pairs` gets the minimum id reachable from it as its
    * `cluster_id`; `is_canonical` marks the cluster representative
    * (the keeper in a keep-one-per-cluster dedup).
    *
    * Alternating large-star / small-star rounds (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14): each
    * round rewires every edge toward the minimum of a node's closed
    * neighborhood — large-star hangs every LARGER neighbor of u off
    * min(N(u) ∪ {u}), small-star re-hangs every SMALLER-or-equal
    * neighbor off the same minimum — and the unique fixed point is one
    * star per component rooted at the component minimum. Convergence is
    * O(log² n) rounds in the WORST case and independent of graph
    * diameter — a 10⁹-node boilerplate chain converges in the same
    * handful of rounds as a dense clique, where plain min-label
    * propagation needs diameter rounds. Each half-round is a
    * groupBy-min plus a key-join (no neighborhood materialization, no
    * driver-side data); per-round edge count never grows (each input
    * edge maps to exactly one output edge, then DISTINCT). `maxIter` is
    * a safety bound, not a tuning knob: hitting it is astronomically
    * out of reach for real corpora (2^20 ≫ any n), and if it IS hit the
    * call FAILS LOUDLY rather than returning partial labels — this
    * operator decides which training data gets dropped, so a silent
    * wrong answer is the one unacceptable outcome.
    *
    * Lineage is cut every half-round so plans stay flat across
    * iterations. Reliable (fault-tolerant) checkpointing engages
    * AUTOMATICALLY whenever the session has a checkpoint dir configured
    * (`sc.setCheckpointDir` — always true on a production cluster);
    * without one, rounds ride the executor-memory-resident
    * `localCheckpoint` (fine for tests/single-node, lost with an
    * executor). Pass `reliableCheckpoint = Some(...)` to override
    * either way — `Some(true)` without a checkpoint dir fails fast
    * rather than letting Spark throw mid-iteration.
    *
    * Singleton documents (no pair) are not emitted by default — pass
    * the full id universe as `universe` (a DataFrame whose FIRST column
    * is the id) and every id absent from `pairs` comes back as its own
    * canonical cluster, so keep-one-per-cluster dedup is one call:
    * `clusters(pairs, universe = Some(docs.select("doc_id")))
    * .filter(col("is_canonical"))`. The singleton leg is one anti-join
    * against the (pairs-sized, small) label table — the universe is
    * never shuffled into the label propagation.
    */
  def clusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxIter: Int = 20, reliableCheckpoint: Option[Boolean] = None,
      universe: Option[DataFrame] = None): DataFrame = {
    val hasDir = pairs.sparkSession.sparkContext.getCheckpointDir.isDefined
    val reliable = reliableCheckpoint.getOrElse(hasDir)
    require(!reliable || hasDir,
      "reliableCheckpoint=Some(true) requires sparkContext.setCheckpointDir(...)")
    def cut(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint(true)
    // materialize the (narrow, pair-count-sized) id pairs ONCE before
    // fanning out: allIds and edges below each re-evaluate their input
    // lineage, and `pairs` is typically an EXPENSIVE candidate join
    // (banded minhash, multi-probe semantic cells) — without this cut
    // the whole pair pipeline ran twice per clusters() call (measured
    // 440 s for clusters-over-semanticPairs at the 100x replica under
    // the old pair shape — the doubled 267 s pair join plus CC; 48 s
    // after this cut + the pair-side fixes)
    val p = cut(pairs.select(col(idA), col(idB)))
    // every id that appears in `pairs` — self-paired ids survive here
    // even though the self-loop edge itself is dropped below
    val allIds = cut(p.select(col(idA).as("id"))
      .union(p.select(col(idB).as("id"))).distinct())
    // canonical (hi > lo) edge orientation, self-loops dropped
    var edges = cut(p
      .select(greatest(col(idA), col(idB)).as("hi"),
        least(col(idA), col(idB)).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct())
    var edgeCount = edges.count()
    var converged = edgeCount == 0L
    var i = 0
    while (!converged && i < maxIter) {
      // large-star: for each node u, every neighbor v > u re-hangs off
      // m(u) = min(N(u) ∪ {u}). Relational form — a groupBy-min and a
      // key-join — never materializes a neighborhood list, so a hub
      // node with millions of neighbors is just a big group, not a big
      // row.
      val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
        .union(edges.select(col("lo").as("u"), col("hi").as("v")))
      val lmin = sym.groupBy(col("u"))
        .agg(min(col("v")).as("nmin"))
        .select(col("u"), least(col("u"), col("nmin")).as("m"))
      // v > u >= m, so the output is already (hi, lo)-oriented
      val large = cut(sym.join(lmin, "u").filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo")).distinct())
      // small-star: for each node u, every smaller neighbor (and u
      // itself) re-hangs off m(u) = min of u's smaller neighbors
      val smin = large.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val small = cut(
        large.join(smin, "hi").filter(col("lo") =!= col("m"))
          .select(col("lo").as("hi"), col("m").as("lo"))
          .unionByName(smin.select(col("hi"), col("m").as("lo")))
          .distinct())
      // fixed point = star forest: both half-rounds map it to itself.
      // Both sides are DISTINCT sets, so equal counts + an empty
      // one-sided difference IS set equality — one count (cheap on the
      // checkpointed frame) replaces the second exceptAll join, and
      // the exceptAll runs only on rounds whose counts already match
      val smallCount = small.count()
      converged = smallCount == edgeCount && small.exceptAll(edges).isEmpty
      edges = small
      edgeCount = smallCount
      i += 1
    }
    require(converged,
      s"graft: connected components did not converge within maxIter=$maxIter " +
      "alternating large-star/small-star rounds — refusing to return partial " +
      "cluster labels (they would silently mislabel keepers). This bound is " +
      "~2^maxIter nodes; raise maxIter only after checking the pair input.")
    // at the fixed point every non-root appears exactly once as `hi`,
    // pointing at its component's minimum id; roots never appear as `hi`
    val nonRoots = edges.select(col("hi").as("id"), col("lo").as("cluster_id"),
      lit(false).as("is_canonical"))
    val roots = allIds.join(edges.select(col("hi").as("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster_id"), lit(true).as("is_canonical"))
    val clustered = nonRoots.unionByName(roots)
    universe match {
      case None => clustered
      case Some(all) =>
        // distinct: a universe with duplicate ids (built from a join,
        // say) must not emit duplicate singleton rows
        val ids = all.select(col(all.columns.head).as("id")).distinct()
        val singles = ids.join(allIds, Seq("id"), "left_anti")
          .select(col("id"), col("id").as("cluster_id"),
            lit(true).as("is_canonical"))
        clustered.unionByName(singles)
    }
  }

  /** Exact-substring near-dup pairs: documents sharing at least one
    * EXACT `windowTokens`-token window — the strongest-signal dedup in
    * LLM training practice (verbatim passage reuse survives the edits
    * that break whole-document similarity). Returns (id_a, id_b,
    * n_shared) with the count of distinct shared windows.
    *
    * Shuffle-bounded by construction: the shingle kernel already
    * returns each doc's windows sorted-DISTINCT (map-side, no dedup
    * shuffle), the document-frequency cap is one window count over
    * the gram key, and the pair join reuses that same gram
    * partitioning (ReusedExchange — pinned in PlanSpec), so candidate
    * volume per gram is <= maxDf^2, bounded.
    * `maxDf` drops boilerplate windows (licenses, headers) that would
    * otherwise pair everything with everything — the standard
    * posting-list cap of suffix-array dedup pipelines; capped grams
    * are exactly reproducible by the SQL oracle, unlike a sampled or
    * probabilistic guard.
    *
    * The windows are 64-bit fnv1a hashes, so a hash collision cuts both
    * ways: it can pair two unrelated documents (spurious candidate) AND
    * it can merge two distinct windows' postings, pushing a legitimate
    * gram over `maxDf` and losing its true pairs. Both effects carry
    * probability ~n_windows^2 / 2^64 — negligible at any corpus the cap
    * itself is sane for, so neither is mitigated in code. */
  def sharedWindowPairs(df: DataFrame, textCol: String, idCol: String,
      windowTokens: Int = 8, maxDf: Long = 20L): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      explode(Bridge.column(HashedWordShingles(
        Bridge.expression(col(textCol)), windowTokens))).as("g"))
    val w = Window.partitionBy(col("g"))
    val capped = grams.withColumn("_df", count(lit(1)).over(w))
      .filter(col("_df") <= maxDf).drop("_df")
    capped.as("l")
      .join(capped.as("r"),
        col("l.g") === col("r.g") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** CONTAINMENT dedup pairs — the directional overlap measure
    * (Broder 1997's containment, |g(A) ∩ g(B)| / |g(A)|) that catches
    * what Jaccard structurally cannot: a short document living almost
    * entirely inside a long one (an excerpt, a quoted article, a
    * re-post with commentary) has near-1 containment but LOW Jaccard
    * (the union is dominated by the long side), so symmetric near-dup
    * passes never flag it. Returns (id_a, id_b, n_inter, sz_a,
    * contain_pct) for ordered pairs where ≥ `minContainPct`% of A's
    * df-capped distinct word-`windowTokens`-shingles appear in B —
    * directional: the excerpt flags against its source, never the
    * reverse.
    *
    * All set algebra runs on the DF-CAPPED postings (shingles in
    * ≤ `maxDf` docs): the cap bounds the candidate join exactly as in
    * [[sharedWindowPairs]] (a boilerplate shingle in a million docs
    * must not key a join), and because a capped shingle leaves the
    * numerator AND the denominator of every document consistently,
    * the ratio stays a faithful containment over discriminative
    * content. Integer percent (100·n div sz) keeps both engines'
    * threshold decisions identical. */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
      windowTokens: Int = 3, maxDf: Long = 20L,
      minContainPct: Int = 80): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      explode(Bridge.column(HashedWordShingles(
        Bridge.expression(col(textCol)), windowTokens))).as("g"))
    val w = Window.partitionBy(col("g"))
    val capped = grams.withColumn("_df", count(lit(1)).over(w))
      .filter(col("_df") <= maxDf).drop("_df")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = capped.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val out = capped.as("l")
      .join(capped.as("r"),
        col("l.g") === col("r.g") && col("l.id") =!= col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .withColumn("contain_pct", expr("(100 * n_inter) div sz_a"))
      .filter(col("contain_pct") >= minContainPct)
      .select(col("id_a"), col("id_b"), col("n_inter"), col("sz_a"),
        col("contain_pct"))
      .localCheckpoint(eager = true)
    capped.unpersist()
    out
  }

  /** Semantic dedup pairs, SemDeDup-style (Abbas et al. 2023,
    * arXiv:2303.09540): partition the corpus by a small coarse
    * quantizer (k centroid vectors), then emit within-cluster pairs
    * whose exact cosine clears `tau` — near-duplicate MEANING, not
    * near-duplicate text, which catches translations/paraphrases that
    * every lexical dedup misses. Composes with [[clusters]] for the
    * keep-one-per-group decision.
    *
    * Cluster blocking turns the O(n^2) all-pairs problem into
    * sum(|cluster|^2) — the whole point of the method. Plan shape at
    * 100 TB: the k seed vectors ride ONE broadcast into a map-side
    * score+argmax (partial-aggregated max_by, so the per-vector k
    * scores collapse before any exchange), and the only data shuffle
    * is the within-cluster pair join keyed on cluster_id. Every
    * returned pair carries its EXACT cosine (approximation only
    * decides which pairs are compared, never their scores — same
    * verify-exactly contract as the LSH paths).
    *
    * The default quantizer is the deterministic id-prefix seed set
    * (first k vectors by id — same rule as the IVF/PQ quantizer
    * inits), which keeps the whole operator one declarative plan and
    * makes it SQL-oracle-able end to end. Assignment ranks by the
    * ROUNDED (4dp) cosine with seed-id tie-break, so the argmax is
    * engine-independent. Pass `centroids` (seed_id, sv) to plug in
    * refined centers (e.g. a trained k-means codebook) — recall vs
    * the brute pair set rises with centroid quality, precision is 1.0
    * by construction either way.
    *
    * `k` defaults to AUTO (-1): [[autoK]] sizes the quantizer at
    * ~sqrt(n) clusters, the same occupancy-held rule as
    * [[Similarity.autoNlist]] — mean cluster size and per-vector
    * comparison count both grow as sqrt(n) instead of linearly. A
    * FIXED k is the shape [[autoBits]]/autoNlist exist to kill:
    * within-cluster all-pairs is O(n²/k) — quadratic at any constant —
    * and the one data shuffle keys on only k distinct cluster ids, so
    * at scale it lands on k hot partitions. AUTO costs one count()
    * pass over the corpus UNLESS `rowHint` (> 0) supplies the row
    * count (sqrt sizing needs only the order of magnitude —
    * NoHiddenScanSpec pins that a hinted call launches no job); pass
    * explicit k to pin a shape (the d_semdedup oracle contract does,
    * k=16 on an id-capped corpus).
    *
    * `probes` is the recall knob (default 1 = the paper's
    * single-assignment blocking): each vector joins its `probes`
    * nearest clusters — IVF's nprobe idea applied to pair blocking —
    * so a tau-pair straddling a cluster boundary is recovered when the
    * two vectors share ANY probed cluster. Candidate volume grows
    * <= probes² per cluster-occupancy unit (in practice ~probes×,
    * pairs sharing several probed clusters are DISTINCT'd before the
    * exact-cosine verify, the same two-phase shape as
    * [[embeddingPairs]]). The multi-probe assignment is one map-side
    * [[CentroidCosines]] projection + per-row top-p slice over the
    * broadcast centroid matrix — no crossJoin fanout, no window
    * shuffle; the centroid matrix is collected driver-side first (k x
    * dim floats, KB-scale, same as the IVF quantizer plumbing). */
  /** Multi-probe cluster assignment, (vec_id, lid) with lid the
    * 0-based centroid index: per-row top-`probes` clusters by ROUNDED
    * (4dp) cosine with smaller-lid tie-break — the same argmax rule
    * as [[semanticPairs]]' single-probe path at p=1, extracted so the
    * STREAMING dedup leg blocks arrivals against keeper postings with
    * byte-identical assignments to the batch pair pass. One map-side
    * [[CentroidCosines]] projection + top-p slice; no shuffle. */
  private[graft] def probeAssign(df: DataFrame, vecCol: String,
      idCol: String, centRef: BroadcastCentroids, nlist: Int,
      probes: Int): DataFrame =
    df.select(col(idCol).as("vec_id"),
      explode(Bridge.column(TopProbeCells(
        Bridge.expression(col(vecCol)), centRef,
        math.min(probes, nlist)))).as("lid"))

  def semanticPairs(df: DataFrame, vecCol: String, idCol: String,
      k: Int = -1, tau: Double = 0.35,
      centroids: Option[DataFrame] = None, rowHint: Long = -1L,
      probes: Int = 1): DataFrame = {
    require(probes >= 1, s"semanticPairs: probes must be >= 1, got $probes")
    if (probes == 1) {
      // single-assignment: one declarative plan, SQL-oracle-able end to
      // end (rounded-cosine max_by with seed-id tie-break)
      val seeds = centroids.getOrElse {
        val kk = if (k > 0) k
                 else autoK(if (rowHint > 0) rowHint else df.count())
        df.orderBy(col(idCol)).limit(kk)
          .select(col(idCol).as("seed_id"), col(vecCol).as("sv"))
      }
      val scored = df.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
        .crossJoin(broadcast(seeds))
        .select(col("vec_id"), col("seed_id"),
          round(cosine(col("v"), col("sv")), 4).as("cos4"))
      val assigned = scored.groupBy(col("vec_id"))
        .agg(max_by(col("seed_id"),
          struct(col("cos4"), (-col("seed_id")).as("nid"))).as("cluster_id"))
      val withVec = df.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
        .join(assigned, "vec_id")
      withVec.as("l")
        .join(withVec.as("r"),
          col("l.cluster_id") === col("r.cluster_id") &&
            col("l.vec_id") < col("r.vec_id"))
        .select(col("l.vec_id").as("id_a"), col("r.vec_id").as("id_b"),
          col("l.cluster_id").as("cluster_id"),
          round(cosine(col("l.v"), col("r.v")), 4).as("cos"))
        .filter(col("cos") >= tau)
    } else {
      import org.apache.spark.sql.Row
      // centroid matrix + its seed ids, ordered by seed id (KB-scale
      // driver collect — multi-probe needs the matrix broadcast, same
      // plumbing as the IVF quantizer; vectors must be array<float>
      // and seed ids long-castable, the library-wide embedding shape)
      val seedDf = centroids.getOrElse {
        val kk = if (k > 0) k
                 else autoK(if (rowHint > 0) rowHint else df.count())
        df.orderBy(col(idCol)).limit(kk)
          .select(col(idCol).as("seed_id"), col(vecCol).as("sv"))
      }
      val seedRows = seedDf.orderBy(col("seed_id"))
        .select(col("seed_id").cast("long"), col("sv")).collect()
      val seedIds = seedRows.map(_.getLong(0))
      val cents = seedRows.map { case Row(_, v: scala.collection.Seq[_]) =>
        v.map(_.asInstanceOf[Float]).toSeq }
      val centRef = BroadcastCentroids(
        df.sparkSession.sparkContext.broadcast(cents.map(_.toArray)))
      val nlist = cents.length
      // vectors RIDE the cell join and the cosine streams INLINE in
      // the join output, with the (id_a, id_b) dedup AFTER the tau
      // filter — not embeddingPairs' dedup-candidates-first shape.
      // At this path's probe density the dedup-first shape is the
      // pessimization: candidate mass is ~occupancy x probes per row
      // (512/row at autoNlistPairs occupancy 64, probes 4), so
      // deduping before the vectors join back moved THREE
      // pair-mass-sized shuffles (the dedup groupBy + two vector
      // joins onto ~100M rows) — measured 267 s at the 100x replica
      // vs 29 s for this shape + the TopProbeCells kernel (79 s with
      // this shape under the old sort-chain probe assignment — the
      // per-row nlist-struct sort was the next term once the shuffles
      // fell). Here both join inputs are the SAME
      // n·probes-row frame (one exchange, reused), a shared-cell
      // duplicate costs only a repeated in-join cosine (<= probes
      // repeats, typically 1-2), and only tau-survivors — output-
      // sized, not candidate-sized — reach a shuffle. embeddingPairs
      // keeps dedup-first: at 24 LSH tables its duplication factor
      // (up to 24x) flips the trade the other way.
      val withVec = df.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
        explode(Bridge.column(TopProbeCells(
          Bridge.expression(col(vecCol)), centRef,
          math.min(probes, nlist)))).as("lid"))
      val scored = withVec.as("l")
        .join(withVec.as("r"),
          col("l.lid") === col("r.lid") && col("l.vec_id") < col("r.vec_id"))
        .select(col("l.vec_id").as("id_a"), col("r.vec_id").as("id_b"),
          col("l.lid").as("lid"),
          round(cosine(col("l.v"), col("r.v")), 4).as("cos"))
        .filter(col("cos") >= tau)
      // dedup to the min SHARED lid (the cos is identical across a
      // pair's duplicate cells — max is a deterministic pick of it)
      val dedup = scored.groupBy(col("id_a"), col("id_b"))
        .agg(min(col("lid")).as("lid"), max(col("cos")).as("cos"))
      // lid -> seed_id via a broadcast k-row join, NOT a literal map
      // expression: at the autoK clamp (4096) a CreateMap literal is
      // thousands of plan nodes and an O(k) scan per candidate row
      import df.sparkSession.implicits._
      val lidToSeed = broadcast(seedIds.zipWithIndex
        .map { case (sid, i) => (i, sid) }.toSeq.toDF("lid", "cluster_id"))
      dedup
        .join(lidToSeed, "lid")
        .select(col("id_a"), col("id_b"), col("cluster_id"), col("cos"))
    }
  }

  /** Exact all-pairs cosine ground truth — the verification baseline
    * for [[embeddingPairs]], NOT a scale path: the corpus rides as one
    * broadcast against itself (fine while n x dim floats fit an
    * executor; at real scale the LSH path is the product and this runs
    * on a sample). */
  def bruteEmbeddingPairs(df: DataFrame, vecCol: String, idCol: String,
      minCos: Double = 0.35): DataFrame = {
    val l = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val r = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    l.join(broadcast(r), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 4).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Occupancy-held coarse-quantizer size for [[semanticPairs]]:
    * ~sqrt(n) clusters (delegates to [[Similarity.autoNlist]], same
    * clamp [16, 4096]) hold mean cluster occupancy at ~sqrt(n), so the
    * within-cluster pair volume is ~n·sqrt(n) total spread across
    * sqrt(n) shuffle keys — vs O(n²/k) on k hot partitions at any
    * fixed k. The 4096 clamp keeps the broadcast seed matrix KB-scale
    * and the per-vector scoring fanout bounded. */
  private[graft] def autoK(n: Long): Int = Similarity.autoNlist(n)

  /** Occupancy-held LSH bucket width: smallest bits with mean bucket
    * occupancy <= ~64 per table, clamped to [6, 16]. Keeps the bucket
    * self-join's candidate volume (~occupancy * n) LINEAR in corpus
    * size where fixed bits would make it quadratic. */
  private[graft] def autoBits(n: Long): Int =
    math.min(16, math.max(6,
      math.ceil(math.log(math.max(n, 1L) / 64.0) / math.log(2)).toInt))

  /** Embedding near-dup pairs: multi-table hyperplane-LSH candidate
    * buckets, then cosine verification. Returns (id_a, id_b, cos)
    * with cosine >= `minCos`. Recall rises with `tables` (union of
    * independent bucketings).
    *
    * `bits` defaults to AUTO (-1): sized from the corpus count so mean
    * bucket occupancy stays ~64 per table regardless of corpus size.
    * Candidate volume per table is ~n^2 / 2^bits — with FIXED bits
    * that term is quadratic in n (the 10x scale probe measured 24x
    * wall time at 10x rows on 6 fixed bits), with occupancy-held bits
    * it's ~64n, linear. AUTO costs one count() pass over the corpus
    * (column-pruned scan) UNLESS the caller supplies `rowHint` (> 0):
    * a production job at 100 TB almost always knows its row count (a
    * catalog statistic, a previous stage's output) and must not pay a
    * full scan per operator call to re-derive it — occupancy sizing
    * only needs the order of magnitude, so an approximate hint is
    * fine (NoHiddenScanSpec pins that a hinted call launches no job).
    * AUTO also costs lower per-table recall on borderline pairs as
    * bits rise — high-cosine near-dups stay caught by the table
    * union; pass explicit bits (as the dense 32x5 recall-contract
    * configuration does) to pin a shape. */
  def embeddingPairs(df: DataFrame, vecCol: String, idCol: String,
      minCos: Double = 0.35, tables: Int = 16, bits: Int = -1,
      seed: Long = 7000L, rowHint: Long = -1L): DataFrame = {
    val b = if (bits > 0) bits
            else autoBits(if (rowHint > 0) rowHint else df.count())
    // same two-phase shape as lshJaccardPairs: candidate id-pairs are
    // DISTINCT'd before any vector touches a shuffle — the band join
    // moves (id, table, bucket) rows, not 64-float embeddings (16x the
    // corpus with vectors attached), and the cosine kernel runs ONCE
    // per candidate pair instead of once per colliding table
    val sig = df.select(col(idCol).as("id"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("table"),
          Bridge.column(HyperplaneSig(Bridge.expression(col(vecCol)), b, seed + t)).as("bucket"))): _*)).as("tb"))
      .select(col("id"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val cand = sig.as("l").join(sig.as("r"),
        col("l.table") === col("r.table") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 4).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Content-defined chunking (CDC): split each document at positions
    * where a 3-char content hash satisfies `hash % divisor == 0` — the
    * boundary-selection idea behind rolling-hash chunkers (Rabin/gear
    * CDC in dedup storage; Muthukrishnan's winnowing is the same
    * device): because a cut depends only on the BYTES AROUND IT, an
    * insertion early in a document shifts every byte offset but leaves
    * all downstream cut positions attached to the same content, so
    * unchanged regions keep producing identical chunks — exactly what
    * fixed-width blocks destroy and what makes chunk-hash dedup find
    * shared passages between documents that are not near-duplicates
    * globally (boilerplate headers, quoted paragraphs, license text).
    *
    * Returns one row per chunk instance: (id, idx, h = md5(chunk),
    * chunk_len). Expected chunk length ≈ `divisor` chars. Everything
    * is ONE map-side projection per document: the codegen'd
    * [[graft.plans.CdcChunkStrings]] kernel walks the code points
    * once and emits the chunk strings directly — the identical
    * per-position boundary rule a SQL oracle replays with
    * ascii(substring(...)) terms, but O(n) per document where the
    * rule as a column expression is O(n²) (each substring(t, i, 1)
    * re-scans from the string start; measured 208 s vs ~1 s over the
    * sf0.1 corpus). A per-position independent hash rather than a
    * sequential rolling state is what keeps the rule SQL-replayable
    * position-for-position. Empty documents produce no chunks. */
  def cdcChunks(df: DataFrame, textCol: String, idCol: String,
      divisor: Int = 64): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(Bridge.column(CdcChunkStrings(
          Bridge.expression(col(textCol)), divisor))).as(Seq("p", "chunk")))
      .select(col("id"), (col("p") + 1).cast("long").as("idx"),
        md5(col("chunk")).as("h"),
        length(col("chunk")).cast("long").as("chunk_len"))
}
