package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static kernels callable from both interpreted eval and generated
  * Java (objects without companion classes compile to classes with
  * static forwarders). Primitive loops over ArrayData — no per-element
  * boxing, no row explosion.
  */
object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dp += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dp / d
  }

  /** Random-hyperplane LSH signature: bit i = sign(v . plane_i).
    * Planes are N(0,1), derived deterministically from (seed, dim) —
    * every executor regenerates the same planes, nothing is shipped.
    */
  def hyperplaneSig(v: ArrayData, bits: Int, seed: Long): Long = {
    val dim = v.numElements()
    val planes = planesFor(dim, bits, seed)
    var sig = 0L
    var b = 0
    while (b < bits) {
      val p = planes(b)
      var dp = 0.0
      var i = 0
      while (i < dim) { dp += v.getFloat(i).toDouble * p(i); i += 1 }
      if (dp > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  private val planeCache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Double]]]()
  private def planesFor(dim: Int, bits: Int, seed: Long): Array[Array[Double]] =
    planeCache.computeIfAbsent((dim, bits, seed), { _ =>
      val rnd = new java.util.Random(seed)
      Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
    })

  /** Cosine of `v` against every row of a centroid matrix, one pass,
    * centroid norms precomputed by the caller. */
  def centroidCosines(v: ArrayData, cents: Array[Array[Float]],
      centNorms: Array[Double]): ArrayData = {
    val dim = v.numElements()
    val x = new Array[Double](dim)
    var nv = 0.0
    var i = 0
    while (i < dim) { val e = v.getFloat(i).toDouble; x(i) = e; nv += e * e; i += 1 }
    nv = math.sqrt(nv)
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(dim, cv.length)
      var dp = 0.0
      var j = 0
      while (j < n) { dp += x(j) * cv(j); j += 1 }
      val d = nv * centNorms(c)
      out(c) = if (d == 0.0) 0.0 else dp / d
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Index of the max-cosine centroid (argmin ties -> lowest index). */
  def nearestCentroid(v: ArrayData, cents: Array[Array[Float]],
      centNorms: Array[Double]): Int = {
    val cos = centroidCosines(v, cents, centNorms)
    var best = 0
    var bestV = cos.getDouble(0)
    var i = 1
    while (i < cos.numElements()) {
      val x = cos.getDouble(i)
      if (x > bestV) { bestV = x; best = i }
      i += 1
    }
    best
  }

  def norms(cents: Array[Array[Float]]): Array[Double] =
    cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
      math.sqrt(s)
    }

  /** Top-`probes` centroid indices of `v` by cosine, best-first, ties
    * to the LOWER index — one O(nlist·probes) insertion-selection
    * pass over the matrix, no nlist-element array materialized. */
  def topProbeCells(v: ArrayData, cents: Array[Array[Float]],
      centNorms: Array[Double], probes: Int): ArrayData = {
    val dim = v.numElements()
    val x = new Array[Double](dim)
    var nv = 0.0
    var i = 0
    while (i < dim) { val e = v.getFloat(i).toDouble; x(i) = e; nv += e * e; i += 1 }
    nv = math.sqrt(nv)
    val p = math.min(probes, cents.length)
    val topC = new Array[Double](p)
    val topI = new Array[Int](p)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(dim, cv.length)
      var dp = 0.0
      var j = 0
      while (j < n) { dp += x(j) * cv(j); j += 1 }
      val d = nv * centNorms(c)
      val cos = if (d == 0.0) 0.0 else dp / d
      if (filled < p || cos > topC(p - 1)) {
        // strict > while shifting: an equal cosine never displaces an
        // earlier (lower-index) centroid — the tie rule
        var k = if (filled < p) filled else p - 1
        while (k > 0 && topC(k - 1) < cos) {
          topC(k) = topC(k - 1); topI(k) = topI(k - 1); k -= 1
        }
        topC(k) = cos; topI(k) = c
        if (filled < p) filled += 1
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(topI, filled))
  }

  /** Product-quantization encode: split `v` into `books.length` equal
    * subspaces, code m = index of the L2-nearest centroid of codebook
    * m (L2, not cosine — subvector magnitudes matter for
    * reconstruction), packed 8 bits per code into ONE long (requires
    * M <= 8 subspaces, K <= 256 centroids). A 64-float embedding
    * compresses 256 B -> 8 B. */
  def pqEncode64(v: ArrayData, books: Array[Array[Array[Float]]]): Long = {
    val m = books.length
    val dsub = v.numElements() / m
    if (dsub * m != v.numElements() || dsub != books(0)(0).length)
      throw new IllegalArgumentException(
        s"graft: PQ codebooks (m=$m, dsub=${books(0)(0).length}) do not " +
          s"tile a ${v.numElements()}-dim vector")
    var code = 0L
    var s = 0
    while (s < m) {
      val book = books(s)
      val off = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = v.getFloat(off + j).toDouble - cent(j).toDouble
          d += t * t; j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code |= (best.toLong & 0xffL) << (8 * s)
      s += 1
    }
    code
  }

  /** Scalar-quantization (SQ8) encode: dimension i maps affinely from
    * [min_i, min_i + span_i] onto the 256 levels of one byte. A
    * 64-float embedding compresses 256 B -> 64 B with per-dimension
    * resolution span/255 — far finer than PQ's shared-centroid codes,
    * the standard accuracy/compression middle rung (FAISS SQ8).
    * Out-of-range values (a vector outside the trained bounds) clamp
    * to the edge levels. */
  def sq8Encode(v: ArrayData, mins: Array[Float], spans: Array[Float]): Array[Byte] = {
    val d = v.numElements()
    if (d != mins.length)
      throw new IllegalArgumentException(
        s"graft: SQ8 scales trained for dim ${mins.length} cannot encode a $d-dim vector")
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      val span = spans(i).toDouble
      val t = if (span == 0.0) 0.0
              else (v.getFloat(i).toDouble - mins(i).toDouble) / span
      val lvl = math.round(t * 255.0).toInt
      out(i) = ((if (lvl < 0) 0 else if (lvl > 255) 255 else lvl) - 128).toByte
      i += 1
    }
    out
  }

  /** Asymmetric SQ8 cosine: cosine(exact query, dequantized corpus
    * code) in one pass, never materializing the reconstruction. */
  def sq8Cosine(q: ArrayData, code: Array[Byte], mins: Array[Float],
      spans: Array[Float]): Double = {
    val d = q.numElements()
    if (d != mins.length || code.length != d)
      throw new IllegalArgumentException(
        s"graft: SQ8 dims disagree (query $d, scales ${mins.length}, code ${code.length})")
    var dp = 0.0; var nq = 0.0; var nr = 0.0
    var i = 0
    while (i < d) {
      val x = q.getFloat(i).toDouble
      val y = mins(i).toDouble + ((code(i).toInt + 128) / 255.0) * spans(i).toDouble
      dp += x * y; nq += x * x; nr += y * y
      i += 1
    }
    val den = math.sqrt(nq) * math.sqrt(nr)
    if (den == 0.0) 0.0 else dp / den
  }

  /** Johnson-Lindenstrauss random projection: out_j = row_j . v /
    * sqrt(r) over a seeded Gaussian matrix — derived deterministically
    * from (seed, dim, r) on every executor (same planesFor scheme as
    * the LSH hyperplanes: nothing ships), so reduction needs NO
    * training pass and NO artifact at all. */
  def rpProject(v: ArrayData, r: Int, seed: Long): ArrayData = {
    val dim = v.numElements()
    val mat = rpMatrixFor(dim, r, seed)
    val scale = 1.0 / math.sqrt(r.toDouble)
    val out = new Array[Float](r)
    var j = 0
    while (j < r) {
      val row = mat(j)
      var s = 0.0
      var i = 0
      while (i < dim) { s += row(i) * v.getFloat(i).toDouble; i += 1 }
      out(j) = (s * scale).toFloat
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  private val rpCache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Double]]]()
  private def rpMatrixFor(dim: Int, r: Int, seed: Long): Array[Array[Double]] =
    rpCache.computeIfAbsent((dim, r, seed), { _ =>
      val rnd = new java.util.Random(seed)
      Array.fill(r)(Array.fill(dim)(rnd.nextGaussian()))
    })

  /** PCA projection: out_j = component_j . (v - mean) — one
    * mean-centered matvec, `r` output floats from a d-dim input. */
  def pcaProject(v: ArrayData, mean: Array[Double],
      comps: Array[Array[Double]]): ArrayData = {
    val d = v.numElements()
    if (d != mean.length)
      throw new IllegalArgumentException(
        s"graft: PCA model trained for dim ${mean.length} cannot project a $d-dim vector")
    val xc = new Array[Double](d)
    var i = 0
    while (i < d) { xc(i) = v.getFloat(i).toDouble - mean(i); i += 1 }
    val out = new Array[Float](comps.length)
    var j = 0
    while (j < comps.length) {
      val row = comps(j)
      var s = 0.0
      var k = 0
      while (k < d) { s += row(k) * xc(k); k += 1 }
      out(j) = s.toFloat
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Squared PCA reconstruction error of one vector — for orthonormal
    * components this is ||v - mean||^2 - ||project(v)||^2 (Pythagoras),
    * computed in one pass without materializing the projection row. */
  def pcaResidual2(v: ArrayData, mean: Array[Double],
      comps: Array[Array[Double]]): Double = {
    val d = v.numElements()
    if (d != mean.length)
      throw new IllegalArgumentException(
        s"graft: PCA model trained for dim ${mean.length} cannot score a $d-dim vector")
    val xc = new Array[Double](d)
    var n2 = 0.0
    var i = 0
    while (i < d) {
      val x = v.getFloat(i).toDouble - mean(i)
      xc(i) = x; n2 += x * x; i += 1
    }
    var p2 = 0.0
    var j = 0
    while (j < comps.length) {
      val row = comps(j)
      var s = 0.0
      var k = 0
      while (k < d) { s += row(k) * xc(k); k += 1 }
      p2 += s * s
      j += 1
    }
    math.max(0.0, n2 - p2)
  }

  /** Asymmetric-distance cosine: cosine(q, reconstruct(code)) in one
    * pass, never materializing the reconstructed vector — the exact
    * query vector against the codebook centroids the code names. */
  def pqCosine(q: ArrayData, code: Long, books: Array[Array[Array[Float]]]): Double = {
    val m = books.length
    val dsub = q.numElements() / m
    if (dsub * m != q.numElements() || dsub != books(0)(0).length)
      throw new IllegalArgumentException(
        s"graft: PQ codebooks (m=$m, dsub=${books(0)(0).length}) do not " +
          s"tile a ${q.numElements()}-dim query vector")
    var dp = 0.0; var nq = 0.0; var nr = 0.0
    var s = 0
    while (s < m) {
      val cent = books(s)(((code >>> (8 * s)) & 0xffL).toInt)
      val off = s * dsub
      var j = 0
      while (j < dsub) {
        val x = q.getFloat(off + j).toDouble
        val y = cent(j).toDouble
        dp += x * y; nq += x * x; nr += y * y
        j += 1
      }
      s += 1
    }
    val d = math.sqrt(nq) * math.sqrt(nr)
    if (d == 0.0) 0.0 else dp / d
  }
}

/** How a centroid matrix reaches executors. Both forms keep the PLAN
  * O(1): the expression never inlines nlist array literals, and
  * toString is a compact summary so treeString/explain stay flat as
  * nlist grows.
  *
  *  - [[BroadcastCentroids]] — the scale path: tasks serialize only a
  *    broadcast handle; the matrix ships to each EXECUTOR once
  *    (torrent), not once per task. At nlist=4k x dim=64 that's ~1 MB
  *    saved from every task closure.
  *  - [[InlineCentroids]] — the matrix rides inside the expression
  *    (serialized per task); fine for tests and tiny quantizers.
  */
sealed trait CentroidRef extends Serializable {
  def matrix: Array[Array[Float]]
  def nlist: Int
}

case class InlineCentroids(rows: Seq[Seq[Float]]) extends CentroidRef {
  @transient override lazy val matrix: Array[Array[Float]] = rows.map(_.toArray).toArray
  override def nlist: Int = rows.length
  override def toString: String = s"inline(nlist=$nlist)"
}

case class BroadcastCentroids(
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]]) extends CentroidRef {
  override def matrix: Array[Array[Float]] = bc.value
  override def nlist: Int = -1 // unknown driver-side without fetching; display only
  override def toString: String = s"broadcast(id=${bc.id})"
}

/** Cosines of a vector against a fixed centroid matrix —
  * `array<double>` of length nlist. The matrix rides via a
  * [[CentroidRef]] (broadcast at scale), NOT as nlist inlined array
  * literals: at nlist >= 4k the literal form bloats the plan and the
  * generated code past compilable size, this form stays O(1)
  * plan-side and O(1)-per-executor on the wire. */
case class CentroidCosines(child: Expression, centroids: CentroidRef)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_centroid_cosines"
  @transient private lazy val mat: Array[Array[Float]] = centroids.matrix
  @transient private lazy val matNorms: Array[Double] = VectorOps.norms(mat)
  def kernel(v: ArrayData): ArrayData = VectorOps.centroidCosines(v, mat, matNorms)
  override protected def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidCosines", this, classOf[CentroidCosines].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }
  override protected def withNewChildInternal(c: Expression): CentroidCosines =
    copy(child = c)
}

object CentroidCosines {
  def apply(child: Expression, rows: Seq[Seq[Float]]): CentroidCosines =
    CentroidCosines(child, InlineCentroids(rows))
}

/** argmax-cosine centroid index for a vector — `int`. Same
  * [[CentroidRef]] design as [[CentroidCosines]]; the corpus-side IVF
  * list assignment stays a pure map with no per-row array
  * materialized. */
case class NearestCentroid(child: Expression, centroids: CentroidRef)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"
  @transient private lazy val mat: Array[Array[Float]] = centroids.matrix
  @transient private lazy val matNorms: Array[Double] = VectorOps.norms(mat)
  def kernel(v: ArrayData): Int = VectorOps.nearestCentroid(v, mat, matNorms)
  override protected def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this, classOf[NearestCentroid].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

object NearestCentroid {
  def apply(child: Expression, rows: Seq[Seq[Float]]): NearestCentroid =
    NearestCentroid(child, InlineCentroids(rows))
}

/** Top-`probes` centroid cells of a vector by cosine — `array<int>`,
  * best-first, ties to the lower index. The multi-probe assignment
  * primitive: replaces a zip/sort/reverse/slice chain over
  * [[CentroidCosines]] that materialized and SORTED an nlist-element
  * struct array per row (at nlist in the thousands that sort, not the
  * cosines, dominated assignment cost); this is one O(nlist·probes)
  * selection pass. Comparison is on the UNROUNDED cosine — the old
  * chain's round(c,4) existed only to stabilize the struct sort, and
  * a raw-double order with the index tiebreak is already
  * deterministic. */
case class TopProbeCells(child: Expression, centroids: CentroidRef,
    probes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_top_probe_cells"
  @transient private lazy val mat: Array[Array[Float]] = centroids.matrix
  @transient private lazy val matNorms: Array[Double] = VectorOps.norms(mat)
  def kernel(v: ArrayData): ArrayData =
    VectorOps.topProbeCells(v, mat, matNorms, probes)
  override protected def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topProbeCells", this, classOf[TopProbeCells].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }
  override protected def withNewChildInternal(c: Expression): TopProbeCells =
    copy(child = c)
}

/** dot(array<float>, array<float>) -> double, whole-stage-codegen'd. */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF =
    copy(left = l, right = r)
}

/** cosine(array<float>, array<float>) -> double, whole-stage-codegen'd. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** How PQ codebooks (M subspaces x K centroids x dsub floats) reach
  * executors — same design as [[CentroidRef]]: the plan holds an O(1)
  * reference, never K x M inlined literals. */
sealed trait CodebookRef extends Serializable {
  def books: Array[Array[Array[Float]]]
}

case class InlineCodebooks(rows: Seq[Seq[Seq[Float]]]) extends CodebookRef {
  @transient override lazy val books: Array[Array[Array[Float]]] =
    rows.map(_.map(_.toArray).toArray).toArray
  override def toString: String = s"inline(m=${rows.length})"
}

case class BroadcastCodebooks(
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Float]]]])
    extends CodebookRef {
  override def books: Array[Array[Array[Float]]] = bc.value
  override def toString: String = s"broadcast(id=${bc.id})"
}

/** Product-quantization code of an embedding — ONE long (8-bit codes,
  * M <= 8 subspaces). The corpus-side compression map of PQ ANN. */
case class PQEncode64(child: Expression, codebooks: CodebookRef)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_encode"
  @transient private lazy val mat: Array[Array[Array[Float]]] = codebooks.books
  def kernel(v: ArrayData): Long = VectorOps.pqEncode64(v, mat)
  override protected def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PQEncode64].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }
  override protected def withNewChildInternal(c: Expression): PQEncode64 =
    copy(child = c)
}

/** cosine(exact query vector, PQ-reconstructed corpus vector) —
  * asymmetric-distance scoring, whole-stage-codegen'd. */
case class PQCosine(left: Expression, right: Expression, codebooks: CodebookRef)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_cosine"
  @transient private lazy val mat: Array[Array[Array[Float]]] = codebooks.books
  def kernel(q: ArrayData, code: Long): Double = VectorOps.pqCosine(q, code, mat)
  override protected def nullSafeEval(q: Any, code: Any): Any =
    kernel(q.asInstanceOf[ArrayData], code.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCosine", this, classOf[PQCosine].getName)
    defineCodeGen(ctx, ev, (q, c) => s"$ref.kernel($q, $c)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PQCosine =
    copy(left = l, right = r)
}

/** How SQ8 per-dimension bounds (2 x dim floats) reach executors —
  * same design as [[CentroidRef]]/[[CodebookRef]]: the plan holds an
  * O(1) reference, never 2 x dim inlined literals. */
sealed trait Sq8Ref extends Serializable {
  def mins: Array[Float]
  def spans: Array[Float]
}

case class InlineSq8(minsSeq: Seq[Float], spansSeq: Seq[Float]) extends Sq8Ref {
  @transient override lazy val mins: Array[Float] = minsSeq.toArray
  @transient override lazy val spans: Array[Float] = spansSeq.toArray
  override def toString: String = s"inline(dim=${minsSeq.length})"
}

case class BroadcastSq8(
    bc: org.apache.spark.broadcast.Broadcast[(Array[Float], Array[Float])])
    extends Sq8Ref {
  override def mins: Array[Float] = bc.value._1
  override def spans: Array[Float] = bc.value._2
  override def toString: String = s"broadcast(id=${bc.id})"
}

/** SQ8 code of an embedding — `binary` of dim bytes. The corpus-side
  * compression map of scalar-quantized ANN. */
case class SQ8Encode(child: Expression, scales: Sq8Ref)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sq8_encode"
  @transient private lazy val mn: Array[Float] = scales.mins
  @transient private lazy val sp: Array[Float] = scales.spans
  def kernel(v: ArrayData): Array[Byte] = VectorOps.sq8Encode(v, mn, sp)
  override protected def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Encode", this, classOf[SQ8Encode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }
  override protected def withNewChildInternal(c: Expression): SQ8Encode =
    copy(child = c)
}

/** cosine(exact query vector, SQ8-dequantized corpus code) —
  * asymmetric-distance scoring, whole-stage-codegen'd. */
case class SQ8Cosine(left: Expression, right: Expression, scales: Sq8Ref)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sq8_cosine"
  @transient private lazy val mn: Array[Float] = scales.mins
  @transient private lazy val sp: Array[Float] = scales.spans
  def kernel(q: ArrayData, code: Array[Byte]): Double =
    VectorOps.sq8Cosine(q, code, mn, sp)
  override protected def nullSafeEval(q: Any, code: Any): Any =
    kernel(q.asInstanceOf[ArrayData], code.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Cosine", this, classOf[SQ8Cosine].getName)
    defineCodeGen(ctx, ev, (q, c) => s"$ref.kernel($q, $c)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SQ8Cosine =
    copy(left = l, right = r)
}

/** How a PCA model (mean + r x d component rows) reaches executors —
  * same design as the other artifact refs: O(1) in the plan. */
sealed trait PcaRef extends Serializable {
  def mean: Array[Double]
  def comps: Array[Array[Double]]
}

case class InlinePca(meanSeq: Seq[Double], compSeq: Seq[Seq[Double]]) extends PcaRef {
  @transient override lazy val mean: Array[Double] = meanSeq.toArray
  @transient override lazy val comps: Array[Array[Double]] =
    compSeq.map(_.toArray).toArray
  override def toString: String = s"inline(r=${compSeq.length}, d=${meanSeq.length})"
}

case class BroadcastPca(
    bc: org.apache.spark.broadcast.Broadcast[(Array[Double], Array[Array[Double]])])
    extends PcaRef {
  override def mean: Array[Double] = bc.value._1
  override def comps: Array[Array[Double]] = bc.value._2
  override def toString: String = s"broadcast(id=${bc.id})"
}

/** PCA projection of an embedding — `array<float>` of length r. The
  * corpus-side dimensionality-reduction map. */
case class PcaProject(child: Expression, model: PcaRef)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pca_project"
  @transient private lazy val mn: Array[Double] = model.mean
  @transient private lazy val cp: Array[Array[Double]] = model.comps
  def kernel(v: ArrayData): ArrayData = VectorOps.pcaProject(v, mn, cp)
  override protected def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pcaProject", this, classOf[PcaProject].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }
  override protected def withNewChildInternal(c: Expression): PcaProject =
    copy(child = c)
}

/** Squared PCA reconstruction error of an embedding — `double`. */
case class PcaResidual2(child: Expression, model: PcaRef)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pca_residual2"
  @transient private lazy val mn: Array[Double] = model.mean
  @transient private lazy val cp: Array[Array[Double]] = model.comps
  def kernel(v: ArrayData): Double = VectorOps.pcaResidual2(v, mn, cp)
  override protected def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pcaResidual2", this, classOf[PcaResidual2].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }
  override protected def withNewChildInternal(c: Expression): PcaResidual2 =
    copy(child = c)
}

/** Seeded random projection of an embedding — `array<float>` of
  * length r; the matrix regenerates from (seed, dim, r) per executor,
  * so the expression carries no payload at all. */
case class RpProject(child: Expression, r: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rp_project"
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.rpProject(v.asInstanceOf[ArrayData], r, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorOps.rpProject($c, $r, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): RpProject =
    copy(child = c)
}

/** LSH bucket signature of an embedding: `bits`-bit long. */
case class HyperplaneSig(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hyperplane_sig"
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.hyperplaneSig(v.asInstanceOf[ArrayData], bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorOps.hyperplaneSig($c, $bits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): HyperplaneSig =
    copy(child = c)
}
