package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature: all permutation minimums computed in one
  * scan over the k-shingles, with ONE md5 per shingle.
  *
  * The composed form (`array_min(transform(shingles, h))` per permutation)
  * re-shingles and re-hashes the document once per permutation — 8× redundant
  * md5 work that showed up as the dominant cost of the whole benchmark suite.
  * Semantics are bit-identical to the composed form (and to the SQL oracle):
  * shingle hash = first 15 hex chars of md5 as a 60-bit int mod 2^31-1, then
  * min over (a_i*h + b_i) mod 2^31-1. Duplicate shingles need no dedup — the
  * min is unaffected.
  *
  * Note: shingle positions count UTF-16 units here vs code points in the SQL
  * `substr`; identical for the ASCII corpora this targets.
  */
object MinHashSig {
  private val P = 2147483647L

  def signature(s: UTF8String, k: Int, as: Array[Long], bs: Array[Long]): ArrayData = {
    if (s == null) return null
    val str = s.toString
    val n = str.length
    if (n < k) return null
    val m = as.length
    val mins = Array.fill(m)(Long.MaxValue)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i + k <= n) {
      md.reset()
      val d = md.digest(str.substring(i, i + k).getBytes(StandardCharsets.UTF_8))
      // first 15 hex chars == first 7 bytes + high nibble of the 8th
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h = (h << 4) | ((d(7) & 0xffL) >>> 4)
      val h31 = h % P
      var p = 0
      while (p < m) {
        val v = (as(p) * h31 + bs(p)) % P
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSigExpr(child: Expression, k: Int, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  private lazy val aArr = as.toArray
  private lazy val bArr = bs.toArray

  override def nullSafeEval(v: Any): Any =
    MinHashSig.signature(v.asInstanceOf[UTF8String], k, aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.signature($c, $k, $aRef, $bRef);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
}
