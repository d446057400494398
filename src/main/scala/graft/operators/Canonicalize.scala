package graft.operators

import graft.model.Schemas
import org.apache.spark.sql.DataFrame

/** Column canonicalization (P1) and header validation (P8) — plan-time
  * operations over `df.columns`, never per-row work.
  */
object Canonicalize {

  /** Real price lists carry trailing unnamed junk columns
    * (`Producto,Fecha 1,Provedor,Precio,,,,` — docs/Lista Precios.csv:1).
    * Spark's CSV reader surfaces them as `_cN`; the reference's pandas read
    * keeps then ignores them. Drop anything unnamed.
    */
  def dropJunkColumns(df: DataFrame): DataFrame = {
    val junk = df.columns.filter(c => c.isEmpty || c.matches("_c\\d+"))
    if (junk.isEmpty) df else df.drop(junk.toIndexedSeq: _*)
  }

  /** P1 — rename Spanish headers to canonical names, only for columns present
    * (core/data_processor.py:105-119). When two sources map to the same
    * target (Fecha 1 + Fecha), pandas' dict rename would produce duplicate
    * columns; real inputs never carry both, and we keep the first.
    */
  def canonicalize(df: DataFrame): DataFrame = {
    var out = df
    val taken = scala.collection.mutable.Set[String]()
    Schemas.columnMapping.foreach { case (from, to) =>
      if (out.columns.contains(from) && !taken.contains(to)) {
        out = out.withColumnRenamed(from, to)
        taken += to
      }
    }
    out
  }

  final case class HeaderValidation(missing: Seq[String], extra: Seq[String]) {
    def ok: Boolean = missing.isEmpty
    def message: String =
      if (!ok) s"Missing required columns: ${missing.mkString(", ")}"
      else if (extra.nonEmpty) s"Extra columns ignored: ${extra.mkString(", ")}"
      else "OK"
  }

  /** P8 — upload-validation header check (core/etl_orchestrator.py:434-444):
    * missing required ⇒ error, extra ⇒ warn + ignore.
    */
  def validateHeaders(columns: Seq[String]): HeaderValidation = {
    val cols = columns.map(_.trim)
    HeaderValidation(
      missing = Schemas.requiredHeaders.filterNot(cols.contains),
      extra = cols.filterNot(Schemas.requiredHeaders.contains).filterNot(_.isEmpty))
  }
}
