package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass intra-document repetition counts for training-data quality
  * filtering (the "duplicate n-gram fraction" family of rules):
  * `[nTokens, maxTokenCount, nTrigrams, nDistinctTrigrams]`.
  *
  * Highly repetitive documents (boilerplate, keyword stuffing, scraper junk)
  * are a standard pre-training removal class; the downstream ratios
  * (top-token fraction, duplicate-trigram fraction) are computed in native
  * Column arithmetic from these exact integer counts so the SQL oracle
  * contract stays bit-exact (identical integers → identical IEEE doubles —
  * deliberately NOT rounded, since rounding a derived division is the one
  * operation the two engines disagree on for exact half values).
  *
  * Tokens are runs between single spaces, matching [[TextProfile]] and
  * `split(text, ' ')`; trigrams are the `nTokens - 2` consecutive
  * space-joined token windows. Only counts leave this function, so the whole
  * profile is one scan and one small fixed-size output per document —
  * no explode, no shuffle, safe at any corpus scale.
  */
object RepetitionStats {

  def profile(s: UTF8String): ArrayData = {
    if (s == null) return null
    val str = s.toString
    val n = str.length
    val toks = new java.util.ArrayList[String]()
    var i = 0
    var start = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        if (i > start) toks.add(str.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val nt = toks.size
    val counts = new java.util.HashMap[String, Int]()
    var maxCount = 0
    var j = 0
    while (j < nt) {
      val c = counts.merge(toks.get(j), 1, (a, b) => a + b)
      if (c > maxCount) maxCount = c
      j += 1
    }
    var nTri = 0L
    val triSet = new java.util.HashSet[String]()
    j = 0
    while (j + 2 < nt) {
      triSet.add(toks.get(j) + " " + toks.get(j + 1) + " " + toks.get(j + 2))
      nTri += 1
      j += 1
    }
    new GenericArrayData(Array[Long](nt.toLong, maxCount.toLong, nTri, triSet.size.toLong))
  }
}

/** `graft_repetition_stats(text)` — see [[RepetitionStats.profile]]. */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "graft_repetition_stats"

  override def nullSafeEval(v: Any): Any =
    RepetitionStats.profile(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStats.profile($c)")

  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
}
