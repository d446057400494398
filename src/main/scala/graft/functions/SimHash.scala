package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash over whitespace tokens — near-duplicate sketch for
  * training-data dedup. One pass per document, no shuffle; Hamming distance
  * between sketches approximates token-multiset cosine similarity.
  *
  * Token hash = first 15 hex chars of md5 (= [[graft.operators.TextOps.md5Long]]),
  * so the whole sketch reproduces bit-for-bit in the ANSI-SQL oracle: per bit
  * j, sign(sum over tokens of ±1 by bit j of the token hash) — 60 bits
  * assembled little-endian. A native-expression composition would need 60
  * higher-order aggregates per row; this single-pass custom expression is the
  * scalar-function case (b) of the extension preference order.
  */
object SimHash {
  val Bits = 60

  /** First 15 hex chars of md5 as a 60-bit int — equals the SQL oracle's
    * `('0x'||substr(md5(t),1,15))::BIGINT`, computed from the digest bytes
    * directly (first 7 bytes + high nibble of the 8th), no hex string.
    */
  def tokenHash(md: MessageDigest, token: String): Long = {
    md.reset()
    val d = md.digest(token.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var j = 0
    while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
    (h << 4) | ((d(7) & 0xffL) >>> 4)
  }

  def tokenHash(token: String): Long =
    tokenHash(MessageDigest.getInstance("MD5"), token)

  def simhash(text: String): Long = {
    if (text == null) return 0L
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Int](Bits)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val h = tokenHash(md, text.substring(start, i))
          var j = 0
          while (j < Bits) {
            if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < Bits) {
      if (counts(j) > 0) v |= (1L << j)
      j += 1
    }
    v
  }

  def simhashUTF8(s: UTF8String): Long = if (s == null) 0L else simhash(s.toString)

  /** Hamming distance between two sketches. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(v: Any): Any = SimHash.simhashUTF8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.simhashUTF8($c)")

  override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(child = c)
}
