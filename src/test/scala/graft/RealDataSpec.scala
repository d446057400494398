package graft

import java.nio.file.{Files, Paths}

import graft.model.Schemas
import graft.sources.{CsvSource, Warehouse}
import org.apache.spark.sql.functions._

/** End-to-end run over the reference's real price list
  * (docs/Lista Precios.csv: 1,467 messy Spanish rows — accents, trailing
  * spaces, footnote marks, a malformed 5-digit year). Asserts the end-state
  * facts SURVEY.md §7 pins for the minimum slice.
  */
class RealDataSpec extends SparkSpec {

  private val realCsv = "/root/reference/docs/Lista Precios.csv"

  private def available: Boolean = Files.exists(Paths.get(realCsv))

  test("full pipeline over Lista Precios.csv reproduces the reference end-state") {
    assume(available, s"$realCsv not present")
    val wh = new Warehouse(spark, Files.createTempDirectory("graft-real-").toString)
    val p = new Pipeline(spark, wh)

    // 1468 data rows: wc -l reports 1468 NEWLINES incl. header, but the last
    // line is unterminated, so header + 1468 data rows
    val raw = CsvSource.readPath(spark, realCsv)
    assert(raw.count() == 1468, "all data rows parsed")

    val res = p.processCsv(raw, "products", "Lista Precios.csv")
    assert(res.status, res.message)

    val providers = p.wh.read("dims/Provider", Schemas.provider)
    val names = providers.collect().map(_.getString(1)).toSeq

    // F4 camel-case separation unifies "DosPinos" with "Dos Pinos"
    assert(names.count(_ == "Dos Pinos") == 1)
    assert(!names.contains("DosPinos"))
    // "Serrano " (115 rows) vs "Serrano" (48 rows): distinct in staging, ONE
    // dim row after the rtrim merge key (SURVEY §7 risk 6)
    assert(names.count(_.trim == "Serrano") == 1)
    // accented provider: F3 strips non-ASCII (the reference's own regex), so
    // "Génesis" lands as "Gnesis" — verified against CPython:
    // re.sub(r'[^A-Za-z0-9/% ]+','','Génesis').title() == 'Gnesis'
    assert(names.exists(_.startsWith("Gnesis")))
    assert(!names.exists(_.startsWith("Génesis")))

    // row 2 golden: "Aceite Capullo 500ml *" → price 1347, measure 500 ml
    val prod = p.wh.read("dims/Product", Schemas.product)
      .filter(col("Description").startsWith("Aceite Capullo 500ml")).collect()
    assert(prod.nonEmpty)
    assert(prod.head.getDecimal(3) == new java.math.BigDecimal("500.00")) // Measure

    val pp = p.wh.read("dims/Provider_Product", Schemas.providerProduct)
    val capPp = pp.filter(col("ProductId") === prod.head.getInt(0)).collect()
    assert(capPp.nonEmpty)
    assert(capPp.head.getDecimal(7) == new java.math.BigDecimal("1347.00"))

    // the malformed year "23/04/20025" (line 30: "Alimento Concentrado Duketa
    // Perro k", sole row for that product) must yield a NULL review date —
    // not an error, not a garbage parse
    val duketa = p.wh.read("dims/Product", Schemas.product)
      .filter(col("Description") === "Alimento Concentrado Duketa Perro k").collect()
    assert(duketa.length == 1)
    val duketaPp = pp.filter(col("ProductId") === duketa.head.getInt(0)).collect()
    assert(duketaPp.length == 1 && duketaPp.head.isNullAt(4),
      s"malformed year must parse to null, got ${duketaPp.map(_.get(4)).mkString(",")}")

    // ledger closed out
    assert(p.ledger.statusOf("products", "Lista Precios.csv") == Schemas.FileStatus.Success)
  }
}
