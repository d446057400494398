package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV ingestion (S1/S2): header row, everything read as strings
  * (`inferSchema=false`) so the Raw* columns keep the exact cell text the
  * reference's pandas `astype(str)` would (SURVEY.md §1.3). The transform
  * layer owns all typing.
  */
object CsvSource {

  /** S1 — file/path scan (multi-file glob works; the path is the unit of
    * parallelism at scale: one task per 128MB split).
    */
  def readPath(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(path)

  /** S2 — parse an in-memory CSV string (validation/extraction path). */
  def readString(spark: SparkSession, csv: String): DataFrame = {
    import spark.implicits._
    spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(csv.linesIterator.toSeq.toDS())
  }
}
