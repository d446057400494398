package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DecimalType, IntegerType, StringType}

/** The reference's scalar-function library (SURVEY.md §2.3, F1–F17) as native
  * `Column` expressions. Everything here is a pure projection — null-safe,
  * codegen-friendly, no shuffles — so one `withColumns` pass over a 100 TB scan
  * stays a single narrow stage.
  *
  * Null semantics: the reference wraps every scalar in `try/except → None`
  * (core/data_processor.py); Spark expressions are null-propagating by default,
  * which matches. Where the reference returns None on *semantic* failure (bad
  * date, non-numeric price, no regex match) the expressions below yield null
  * explicitly.
  */
object Transforms {

  /** measure_regex, core/data_processor.py:13 (same dialect in Java regex). */
  val MeasureRe = "(\\d+\\.?\\d*)\\s*([a-zA-Z]{1,3})"

  /** package_units_regex, core/data_processor.py:14. */
  val PackageUnitsRe = "[x]\\s*(\\d+)"

  /** IVA pattern, core/data_processor.py:100. */
  val IvaRe = "\\(\\s*[Gg]\\s*(\\d+)\\s*\\)"

  private def nullIfEmpty(c: Column): Column = when(length(c) === 0, lit(null).cast(StringType)).otherwise(c)

  /** F1 — fuzzy day-first date inference → 'yyyy-MM-dd' string or null. */
  def inferDate(c: Column): Column = shims.column(FuzzyDateExpr(shims.expression(c)))

  /** F5/F6 — `text.strip().title()` with Python word-boundary semantics
    * (empty string passes through; core/data_processor.py:50-60).
    */
  def cleanDescription(c: Column): Column = shims.column(PyTitleExpr(shims.expression(c), strip = true))

  /** Python `str.title()` without the strip (used inside F7). */
  def pyTitle(c: Column): Column = shims.column(PyTitleExpr(shims.expression(c), strip = false))

  /** F2 — transform_price: drop `. , $ space`, then decimal; null if the
    * residue is not numeric (core/data_processor.py:23-28). "$ 1.500,50" → 150050.
    */
  def cleanPrice(c: Column): Column =
    regexp_replace(c, "[.,$ ]", "").try_cast(DecimalType(18, 2))

  /** F3 — keep only `[A-Za-z0-9/% ]` (core/data_processor.py:30-34). */
  def removeSpecialCharacters(c: Column): Column =
    regexp_replace(c, "[^A-Za-z0-9/% ]+", "")

  /** F4 — split camelCase / letter-digit seams: `([a-z])([A-Z0-9])` → `$1 $2`
    * (core/data_processor.py:36-40).
    */
  def separateCamelCase(c: Column): Column =
    regexp_replace(c, "([a-z])([A-Z0-9])", "$1 $2")

  /** F7 — provider pipeline: F3 → (empty⇒null) → F4 → title; never strips
    * whitespace (core/data_processor.py:42-48 — `"Serrano "` keeps its
    * trailing space, see SURVEY.md §7 risk 6).
    */
  def cleanProviderName(c: Column): Column = {
    val cleaned = nullIfEmpty(removeSpecialCharacters(c))
    pyTitle(separateCamelCase(cleaned))
  }

  /** F8 — first `(\d+\.?\d*)` before a 1-3 letter unit; null if absent. */
  def extractMeasure(c: Column): Column = nullIfEmpty(regexp_extract(c, MeasureRe, 1))

  /** F9 — the unit letters; lowercased at the struct call site, as in
    * extract_measure_and_unit (core/data_processor.py:83-88).
    */
  def extractUnit(c: Column): Column = nullIfEmpty(regexp_extract(c, MeasureRe, 2))

  /** F10 — `x<digits>` package-count extraction. */
  def extractPackageUnits(c: Column): Column = nullIfEmpty(regexp_extract(c, PackageUnitsRe, 1))

  /** F11 — struct(measure, lower(unit), package_units). */
  def extractMeasureAndUnit(c: Column): Column =
    struct(
      extractMeasure(c).as("measure"),
      lower(extractUnit(c)).as("unit"),
      extractPackageUnits(c).as("package_units"))

  /** F12 — delete the `x<digits>` substring (input passes through on no match). */
  def removePackageUnits(c: Column): Column = regexp_replace(c, PackageUnitsRe, "")

  /** F13 — `(G13)` / `(g 13)` → 13; first match wins; null when absent. */
  def extractIva(c: Column): Column =
    nullIfEmpty(regexp_extract(c, IvaRe, 1)).try_cast(IntegerType)

  /** F14 — today's date as a 'yyyy-MM-dd' string (LastReviewDt default). */
  def currentDateStr: Column = date_format(current_date(), "yyyy-MM-dd")

  /** F15 — `astype(str)` preservation of the raw cell. pandas renders missing
    * cells as the literal "nan" (NaN → str), and the reference stores exactly
    * that in the Raw* columns, so we reproduce it rather than keep null.
    */
  def rawString(c: Column): Column = coalesce(c.cast(StringType), lit("nan"))

  /** P6 — IsValidPrice = Price present AND cleaned price parseable. */
  def isValidPrice(price: Column, clean: Column): Column =
    price.isNotNull && clean.isNotNull

  /** Vector kernels (training-data ops; see VectorOps). */
  def vecDot(a: Column, b: Column): Column =
    shims.column(VectorDotExpr(shims.expression(a), shims.expression(b)))
  def vecCosine(a: Column, b: Column): Column =
    shims.column(VectorCosineExpr(shims.expression(a), shims.expression(b)))
  def vecNorm(a: Column): Column =
    shims.column(VectorNormExpr(shims.expression(a)))

  /** SQ8 quantization kernels (see Sq8Ops). */
  def sq8Encode(a: Column): Column =
    shims.column(Sq8EncodeExpr(shims.expression(a)))
  def sq8Cosine(a: Column, b: Column): Column =
    shims.column(Sq8CosineExpr(shims.expression(a), shims.expression(b)))
}
