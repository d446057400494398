package graft

import graft.functions.{FuzzyDate, PyTitle, Transforms => T}
import org.apache.spark.sql.functions._

/** Golden tests ported from the reference's tier-1 suite
  * (tests/test_data_processor.py — every parametrized case, same inputs and
  * expected outputs), evaluated through the Spark column expressions so the
  * codegen path is what's under test.
  */
class TransformsSpec extends SparkSpec {

  // ---- F1 infer_and_transform_date (tests/test_data_processor.py:36-53) ----
  test("F1 date inference: golden formats") {
    checkCases(Seq(
      "15/03/2024" -> "2024-03-15",
      "03/15/2024" -> "2024-03-15",
      "March 15, 2024" -> "2024-03-15",
      "2024-03-15" -> "2024-03-15",
      "" -> null,
      "not a date" -> null,
      "None" -> null,
      // real-data garbage, docs/Lista Precios.csv:30 (5-digit year)
      "23/04/20025" -> null,
      "1/07/2025" -> "2025-07-01",
      "07/03/2025" -> "2025-03-07", // day-first, unlike US convention
      "15/03/24" -> "2024-03-15",   // dateutil 2-digit year => 2000s
      "15 March 2024" -> "2024-03-15",
      (null: String) -> null))(T.inferDate)
  }

  // ---- F2 transform_price (tests/test_data_processor.py:60-78) ----
  test("F2 price cleaning: golden formats") {
    def bd(s: String) = new java.math.BigDecimal(s).setScale(2)
    checkCases(Seq(
      "1000" -> bd("1000"),
      "1,000" -> bd("1000"),
      "$1,000" -> bd("1000"),
      "1.000" -> bd("1000"),
      "$ 1.500,50" -> bd("150050"),
      "" -> null,
      "not a price" -> null,
      "$.," -> null,
      (null: String) -> null))(T.cleanPrice)
  }

  // ---- F3 remove_special_characters (tests/test_data_processor.py:85-101) ----
  test("F3 remove special characters") {
    checkCases(Seq(
      "Harina@de#Trigo!" -> "HarinadeTrigo",
      "Producto 100% Natural/Organico" -> "Producto 100% Natural/Organico",
      "Producto123@#$" -> "Producto123",
      "" -> "",
      "@#$!" -> ""))(T.removeSpecialCharacters)
  }

  // ---- F4 separate_camel_case (tests/test_data_processor.py:103-119) ----
  test("F4 separate camel case") {
    checkCases(Seq(
      "HarinaDeTrigo" -> "Harina De Trigo",
      "Producto123ABC" -> "Producto 123ABC",
      "Already Separated" -> "Already Separated",
      "Word" -> "Word",
      "" -> "",
      "lowercase" -> "lowercase",
      "UPPERCASE" -> "UPPERCASE"))(T.separateCamelCase)
  }

  // ---- F7 transform_provider_name (tests/test_data_processor.py:125-141) ----
  test("F7 provider name pipeline") {
    checkCases(Seq(
      "ProveedorABC@123" -> "Proveedor Abc123",
      "MiProveedor" -> "Mi Proveedor",
      "Proveedor123ABC" -> "Proveedor 123Abc",
      "" -> null,
      "@#$!" -> null,
      // trailing space must survive (SURVEY.md §7 risk 6; real data "Serrano ")
      "Serrano " -> "Serrano ",
      (null: String) -> null))(T.cleanProviderName)
  }

  // ---- F5/F6 transform_description (tests/test_data_processor.py:143-155) ----
  test("F5 description title-case (Python str.title, not initcap)") {
    checkCases(Seq(
      "ProductoEspecial@123" -> "Productoespecial@123",
      "MiProducto" -> "Miproducto",
      "hello world" -> "Hello World",
      "HELLO WORLD" -> "Hello World",
      "hello-world test" -> "Hello-World Test", // the initcap-breaking case
      "product description here" -> "Product Description Here",
      "" -> "",
      "a" -> "A",
      "  padded  " -> "Padded", // strip() before title()
      (null: String) -> null))(T.cleanDescription)
  }

  test("PyTitle matches Python str.title on unicode and digit boundaries") {
    assert(PyTitle.title("génesis s.a.") == "Génesis S.A.")
    assert(PyTitle.title("producto123abc") == "Producto123Abc")
    assert(PyTitle.title("zepol ungüento") == "Zepol Ungüento")
    assert(PyTitle.title("they're ok") == "They'Re Ok")
    assert(PyTitle.title("ǆungla") == "ǅungla") // titlecase letter, not uppercase
  }

  // ---- F8/F9/F10/F11 measure & unit extraction (tests:163-221) ----
  test("F8 extract measure") {
    checkCases(Seq(
      "500g de harina" -> "500",
      "1.5kg arroz" -> "1.5",
      "500g y 200ml" -> "500", // first match wins
      "solo texto" -> null,
      "" -> null))(T.extractMeasure)
  }

  test("F9 extract unit (lowered in struct as in reference)") {
    checkCases(Seq(
      "500g de harina" -> "g",
      "1.5kg arroz" -> "kg",
      "200ml agua" -> "ml",
      "solo texto" -> null,
      "" -> null))(c => lower(T.extractUnit(c)))
  }

  test("F10 extract package units") {
    checkCases(Seq(
      "Arroz x 12 unidades" -> "12",
      "Producto x 6 piezas" -> "6",
      "Itemx24" -> "24",
      "solo producto" -> null,
      "" -> null))(T.extractPackageUnits)
  }

  test("F11 combined struct (tests:213-221)") {
    val got = evalCases(Seq(
      "Arroz 500g x 12 unidades", "Harina 1.5kg", "Producto x 6", "Solo texto"))(T.extractMeasureAndUnit)
    val rows = got.map(_.asInstanceOf[org.apache.spark.sql.Row])
    assert(rows(0) == org.apache.spark.sql.Row("500", "g", "12"))
    assert(rows(1) == org.apache.spark.sql.Row("1.5", "kg", null))
    assert(rows(2) == org.apache.spark.sql.Row(null, null, "6"))
    assert(rows(3) == org.apache.spark.sql.Row(null, null, null))
  }

  // ---- F12 remove_package_units (tests:228-244) ----
  test("F12 remove package units") {
    val got = evalCases(Seq("Arroz x 12 unidades", "Solo texto", ""))(T.removePackageUnits)
    assert(!got(0).asInstanceOf[String].contains("x 12"))
    assert(got(0).asInstanceOf[String].contains("Arroz"))
    assert(got(0).asInstanceOf[String].contains("unidades"))
    assert(got(1) == "Solo texto")
    assert(got(2) == "")
  }

  // ---- F13 extract_iva (tests:251-312) ----
  test("F13 IVA extraction: real product descriptions") {
    checkCases(Seq(
      "MINI PAPA KITTY 1X30(G13)" -> 13,
      "KIKUA CHIPOTLE KITTY 1X25(G13)" -> 13,
      "GUSITITOS SALSA Y QUESO BD 17G 1X12(G13)" -> 13,
      "BUENACHOS SALSAPEÑO BD 18G 1X 12(G13)" -> 13,
      "BORRACHO GUAYABA MOANA 1X24(G 13)" -> 13,
      "ROSCA QUESO MOANA 1X24(G1)" -> 1,
      "GALLETA NATILLA MOANA 1X28(G1 )" -> 1,
      "PRODUCTO (g13)" -> 13,
      "PRODUCTO (g 13)" -> 13,
      "PRODUCTO ( g1 )" -> 1,
      "PRODUCTO SIN IVA" -> null,
      "PRODUCTO (SIN G)" -> null,
      "PRODUCTO (G)" -> null,
      "" -> null,
      (null: String) -> null,
      "PRODUCTO (G5) OTRO (G13)" -> 5, // first match wins
      "PRODUCTO (G123)" -> 123))(T.extractIva)
  }

  // ---- F14/F15 ----
  test("F14 current-date default shape") {
    val got = evalCases(Seq("x"))(_ => T.currentDateStr)
    assert(got.head.asInstanceOf[String].matches("""\d{4}-\d{2}-\d{2}"""))
  }

  test("F15 raw string preserves pandas astype(str) semantics for missing") {
    checkCases(Seq("abc" -> "abc", (null: String) -> "nan"))(T.rawString)
  }

  // ---- FuzzyDate direct unit coverage ----
  test("FuzzyDate handles fuzzy/embedded and degenerate inputs") {
    assert(FuzzyDate.parse("recibido el 15/03/2024 ok") == "2024-03-15")
    assert(FuzzyDate.parse("March 5th, 2024") == "2024-03-05")
    assert(FuzzyDate.parse("31/02/2024") == null) // Feb 31 in any field order
    assert(FuzzyDate.parse("0/0/2024") == null)
    assert(FuzzyDate.parse("2024-13-01") == null)
  }
}
