package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass positional rolling-hash fingerprint — same value as
  * [[graft.operators.TextOps.fingerprint]] (sum_i i·h31(shingle_i) mod 2^31-1)
  * but with one reused MessageDigest and no intermediate arrays; the composed
  * higher-order-function form allocates a per-row array of terms and runs the
  * lambda interpreter per element.
  */
object Fingerprint {
  private val P = 2147483647L

  def fingerprint(s: UTF8String, k: Int): Long = {
    if (s == null) return 0L
    val str = s.toString
    val n = str.length
    if (n < k) return 0L
    val md = MessageDigest.getInstance("MD5")
    var acc = 0L
    var i = 0
    while (i + k <= n) {
      md.reset()
      val d = md.digest(str.substring(i, i + k).getBytes(StandardCharsets.UTF_8))
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h = (h << 4) | ((d(7) & 0xffL) >>> 4)
      // reduce every step: a raw sum of i*(h%P) overflows 2^63 past ~100K
      // chars and turns negative; both factors are < P so the product stays
      // < 2^62 and the result stays congruent to the oracle's exact sum.
      // 1-based position, like the SQL oracle.
      acc = (acc + (((i + 1).toLong % P) * (h % P)) % P) % P
      i += 1
    }
    acc
  }
}

case class FingerprintExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(v: Any): Any =
    Fingerprint.fingerprint(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint.fingerprint($c, $k)")

  override protected def withNewChildInternal(c: Expression): FingerprintExpr = copy(child = c)
}
