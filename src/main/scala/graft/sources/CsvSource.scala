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

  /** S2 — parse an in-memory CSV string (validation/extraction path).
    * Parsed from a temp file with `multiLine=true` so RFC-4180 quoted fields
    * with embedded newlines survive — pre-splitting the string into lines
    * would corrupt such records (pandas' read_csv handles them).
    *
    * The frame is materialized eagerly (these strings are small — LLM
    * extractions / upload validations) so the temp file can be deleted
    * immediately instead of accumulating until JVM exit. Note: the temp path
    * must be visible to executors — true in local mode; a cluster deployment
    * should point java.io.tmpdir at shared scratch or pass data by path.
    */
  def readString(spark: SparkSession, csv: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempFile("graft-csv-", ".csv")
    try {
      java.nio.file.Files.writeString(tmp, csv)
      val df = spark.read
        .option("header", "true")
        .option("inferSchema", "false")
        .option("multiLine", "true")
        .csv(tmp.toString)
        .cache()
      df.count() // force the read before the file disappears
      df
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}
