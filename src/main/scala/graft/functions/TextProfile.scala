package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text profile: `[wsTokens, alphaChars, punctChars, hits_0 …
  * hits_{n-1}, hitsAny]` for the language-ID / quality operators.
  *
  * The composed form re-tokenizes the document once per stopword list (six
  * interpreted `filter(split(...))` passes); this scans characters once and
  * probes each token against the hash sets. Only the COUNTS come from here —
  * the quality/language arithmetic stays in native Column expressions, so the
  * SQL oracle contract is untouched (identical integer inputs → identical
  * doubles).
  *
  * Character classes mirror the Java-regex classes the composed form used:
  * alpha = [A-Za-z]; punct = not alphanumeric and not Java `\s`
  * (space, \t, \n, \x0B, \f, \r). Tokens are runs between single spaces,
  * matching `split(text, " ")`.
  */
object TextProfile {

  @inline private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def profile(s: UTF8String, sets: Array[java.util.HashSet[String]]): ArrayData = {
    if (s == null) return null
    val str = s.toString
    val n = str.length
    val nSets = sets.length
    val out = new Array[Long](3 + nSets + 1)
    var alpha = 0L
    var punct = 0L
    var toks = 0L
    var i = 0
    var start = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        if (i > start) {
          toks += 1
          val tok = str.substring(start, i)
          var any = false
          var j = 0
          while (j < nSets) {
            if (sets(j).contains(tok)) { out(3 + j) += 1; any = true }
            j += 1
          }
          if (any) out(3 + nSets) += 1
        }
        start = i + 1
      }
      if (i < n) {
        val c = str.charAt(i)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha += 1
        else if (!(c >= '0' && c <= '9') && !isJavaWs(c)) punct += 1
      }
      i += 1
    }
    out(0) = toks
    out(1) = alpha
    out(2) = punct
    new GenericArrayData(out)
  }
}

case class TextProfileExpr(child: Expression, stopwordSets: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "graft_text_profile"

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    stopwordSets.map { ws =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray

  override def nullSafeEval(v: Any): Any =
    TextProfile.profile(v.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordSets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextProfile.profile($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): TextProfileExpr = copy(child = c)
}
