package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python `str.title()` semantics (reference: core/data_processor.py:50-60).
  *
  * Spark's `initcap` splits on whitespace only, so `"hello-world"` becomes
  * `"Hello-world"`; Python's `str.title()` treats every non-cased character as
  * a word boundary and yields `"Hello-World"` (pinned by the reference's golden
  * test tests/test_data_processor.py:148). A character is "cased" iff it is
  * Lu/Ll/Lt (matching CPython's `Py_UNICODE_ISUPPER/ISLOWER/ISTITLE` check in
  * `str.title`); the first cased char of each run is titlecased, the rest are
  * lowercased, and uncased chars (digits, punctuation, CJK) pass through.
  */
object PyTitle {

  @inline private def isCased(cp: Int): Boolean =
    Character.isUpperCase(cp) || Character.isLowerCase(cp) ||
      Character.getType(cp) == Character.TITLECASE_LETTER

  def title(s: String): String = {
    if (s == null) return null
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var prevCased = false
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val cased = isCased(cp)
      val out =
        if (cased && !prevCased) Character.toTitleCase(cp)
        else if (cased) Character.toLowerCase(cp)
        else cp
      sb.appendCodePoint(out)
      prevCased = cased
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** UTF8String bridge used from generated code (stays inside whole-stage codegen). */
  def title(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(title(s.toString))

  /** `text.strip().title()`, empty passes through unchanged — the exact
    * contract of `capitalize_first_letter` (core/data_processor.py:50-54).
    */
  def stripTitle(s: UTF8String): UTF8String =
    if (s == null) null
    else if (s.numBytes() == 0) s
    else UTF8String.fromString(title(s.toString.strip()))
}

/** Catalyst expression for [[PyTitle.title]]; codegen emits a static call so the
  * surrounding projection stays in whole-stage codegen.
  */
case class PyTitleExpr(child: Expression, strip: Boolean) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = if (strip) "graft_strip_title" else "graft_title"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    if (strip) PyTitle.stripTitle(s) else PyTitle.title(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (strip) "stripTitle" else "title"
    defineCodeGen(ctx, ev, c => s"graft.functions.PyTitle.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PyTitleExpr =
    copy(child = newChild)
}
