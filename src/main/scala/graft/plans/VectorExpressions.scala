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
