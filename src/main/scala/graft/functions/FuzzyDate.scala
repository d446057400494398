package graft.functions

import java.time.LocalDate
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fuzzy, day-first date inference matching `infer_and_transform_date`
  * (reference: core/data_processor.py:16-21, `dateutil.parser.parse(dayfirst=True,
  * fuzzy=True)` → `'%Y-%m-%d'`, None on failure).
  *
  * dateutil's relevant behavior, pinned by the reference goldens
  * (tests/test_data_processor.py:36-53):
  *   - "15/03/2024" → 2024-03-15  (day-first preferred)
  *   - "03/15/2024" → 2024-03-15  (swaps when day-first is invalid: month 15)
  *   - "March 15, 2024" → 2024-03-15  (textual month)
  *   - "2024-03-15" → 2024-03-15  (ISO; a 4-digit leading field is a year)
  *   - "", "not a date", "None" → null
  * plus real-data garbage like "23/04/20025" (docs/Lista Precios.csv:30) →
  * null (year out of range).
  *
  * Divergence note (SURVEY.md §7 risk 2): dateutil is far more permissive than
  * these goldens (it fills missing fields from "today", accepts bare numbers,
  * etc.). We deliberately implement only *complete* dates — numeric d/m/y with
  * `/-.` separators, ISO, and English textual months, each also matched
  * "fuzzily" anywhere inside a longer string — because defaulting missing
  * parts to the current date is nondeterministic and never exercised by the
  * reference's tests or data.
  */
object FuzzyDate {

  private val months = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)

  private val monthAlt =
    "january|february|march|april|may|june|july|august|september|october|november|december|" +
      "jan|feb|mar|apr|jun|jul|aug|sept|sep|oct|nov|dec"

  // numeric d/m/y or y/m/d with -, / or . separators, anywhere in the string
  private val numeric: Pattern = Pattern.compile(
    """(?<![\d])(\d{1,4})[/\-.](\d{1,2})[/\-.](\d{1,4})(?![\d])""")

  // "March 15, 2024" / "15 March 2024" / "March 2024 15" degenerate forms
  private val textualMdy: Pattern = Pattern.compile(
    s"""(?i)\\b($monthAlt)\\.?\\s+(\\d{1,2})(?:st|nd|rd|th)?\\s*,?\\s+(\\d{2,4})(?![\\d])""")
  private val textualDmy: Pattern = Pattern.compile(
    s"""(?i)(?<![\\d])(\\d{1,2})(?:st|nd|rd|th)?\\s+(?:of\\s+)?($monthAlt)\\.?\\s*,?\\s+(\\d{2,4})(?![\\d])""")

  /** dateutil's two-digit-year convention (relative to the 2000s century). */
  private def expandYear(y: Int, digits: Int): Int =
    if (digits > 2) y
    else if (y < 50) 2000 + y
    else 1900 + y

  private def make(y: Int, m: Int, d: Int): LocalDate =
    if (y < 1 || y > 9999) null
    else if (m < 1 || m > 12) null
    else if (d < 1) null
    else {
      try LocalDate.of(y, m, d)
      catch { case _: java.time.DateTimeException => null }
    }

  /** Resolve a numeric (a, b, c) triple the way dateutil(dayfirst=True) does:
    * a 4-digit leading field is the year (y-m-d); otherwise try d/m/y, then
    * m/d/y, then y/m/d as fallbacks when a field can't be a valid month/day.
    */
  private def resolveNumeric(aStr: String, b: Int, cStr: String): LocalDate = {
    val a = aStr.toInt
    val c = cStr.toInt
    if (aStr.length >= 3) {
      // leading 3-4 digit field → ISO-style y-m-d (dateutil treats it as a year)
      if (cStr.length > 2) null else make(a, b, c)
    } else if (cStr.length >= 3) {
      val y = c
      val dmy = make(y, b, a) // day-first
      if (dmy != null) dmy else make(y, a, b) // month-first fallback
    } else {
      // all fields ≤2 digits: d/m/y preferred, then m/d/y, then y/m/d
      val y = expandYear(c, cStr.length)
      val dmy = make(y, b, a)
      if (dmy != null) dmy
      else {
        val mdy = make(y, a, b)
        if (mdy != null) mdy else make(expandYear(a, aStr.length), b, c)
      }
    }
  }

  def parse(input: String): String = {
    if (input == null) return null
    val s = input.strip()
    if (s.isEmpty) return null

    var best: LocalDate = null

    val nm = numeric.matcher(s)
    if (nm.find()) best = resolveNumeric(nm.group(1), nm.group(2).toInt, nm.group(3))

    if (best == null) {
      val tm = textualMdy.matcher(s)
      if (tm.find()) {
        val m = months(tm.group(1).toLowerCase.take(3))
        best = make(expandYear(tm.group(3).toInt, tm.group(3).length), m, tm.group(2).toInt)
      }
    }
    if (best == null) {
      val dm = textualDmy.matcher(s)
      if (dm.find()) {
        val m = months(dm.group(2).toLowerCase.take(3))
        best = make(expandYear(dm.group(3).toInt, dm.group(3).length), m, dm.group(1).toInt)
      }
    }
    if (best == null) null else best.toString // ISO yyyy-MM-dd
  }

  /** UTF8String bridge for generated code; null on unparseable input. */
  def parseUTF8(s: UTF8String): UTF8String = {
    if (s == null) return null
    val r = parse(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
}

/** Catalyst expression for [[FuzzyDate.parse]]. Result is null either when the
  * input is null or when no date can be inferred, so codegen must re-check
  * nullness after the call (hence the custom `nullSafeCodeGen` body).
  */
case class FuzzyDateExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_infer_date"

  override def nullSafeEval(v: Any): Any =
    FuzzyDate.parseUTF8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.FuzzyDate.parseUTF8($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): FuzzyDateExpr =
    copy(child = newChild)
}
