package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static text-hash kernels (see VectorOps for the codegen pattern). */
object TextOps {

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
