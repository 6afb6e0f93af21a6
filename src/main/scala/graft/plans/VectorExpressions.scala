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
