package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Canonical schemas for the engine's entity layer (reference:
  * core/entities.py + database_schema.mmd). Identity columns become assigned
  * ints (see Merge); SQL Server Unicode/CI-AS collation becomes explicit
  * key normalization at merge time (lower + rtrim, SURVEY.md §7 risk 6).
  */
object Schemas {

  /** Spanish → canonical header mapping, applied only for columns present
    * (core/data_processor.py:107-115). Order matters: first match wins when
    * both "Fecha 1" and "Fecha" appear.
    */
  val columnMapping: Seq[(String, String)] = Seq(
    "Producto" -> "Description",
    "Fecha 1" -> "LastReviewDt",
    "Fecha" -> "LastReviewDt",
    "Provedor" -> "ProviderName",
    "Precio" -> "Price",
    "IVA" -> "PercentageIVA",
    "Porcentaje de IVA" -> "PercentageIVA")

  /** Upload-validation required header set (core/etl_orchestrator.py:423). */
  val requiredHeaders: Seq[String] = Seq("Producto", "Fecha", "Provedor", "Precio", "IVA")

  // ---- dimension / fact tables ----

  val provider: StructType = StructType(Seq(
    StructField("Id", IntegerType, nullable = false),
    StructField("Name", StringType, nullable = false),
    StructField("CreateDt", TimestampType)))

  val unitOfMeasure: StructType = StructType(Seq(
    StructField("Id", IntegerType, nullable = false),
    StructField("Acronym", StringType, nullable = false),
    StructField("Name", StringType)))

  val product: StructType = StructType(Seq(
    StructField("Id", IntegerType, nullable = false),
    StructField("UnitPrice", DecimalType(18, 2)),
    StructField("Description", StringType),
    StructField("Measure", DecimalType(18, 2)),
    StructField("UnitOfMeasureId", IntegerType),
    StructField("CreatedDt", TimestampType),
    StructField("UpdatedDt", TimestampType),
    StructField("DescriptionHash", BinaryType)))

  val providerProduct: StructType = StructType(Seq(
    StructField("Id", IntegerType, nullable = false),
    StructField("ProductId", IntegerType, nullable = false),
    StructField("ProviderId", IntegerType, nullable = false),
    StructField("IsValidated", BooleanType),
    StructField("LastReviewDt", TimestampType),
    StructField("PackageUnits", IntegerType),
    StructField("IVA", DecimalType(18, 2)),
    StructField("Price", DecimalType(18, 2))))

  val providerSynonym: StructType = StructType(Seq(
    StructField("Id", IntegerType, nullable = false),
    StructField("Synonym", StringType, nullable = false),
    StructField("ProviderId", IntegerType, nullable = false)))

  val unitOfMeasureAcronym: StructType = StructType(Seq(
    StructField("Id", IntegerType, nullable = false),
    StructField("Acronym", StringType, nullable = false),
    StructField("UnitOfMeasureId", IntegerType, nullable = false)))

  /** File-processing ledger (ProcessFile, core/entities.py:78-101).
    * Statuses (FileStatus): 1 = not seen, 2 = in progress, 3 = success,
    * 4 = failed (docs/ETL_ENHANCEMENTS.md:8-12).
    */
  val processFile: StructType = StructType(Seq(
    StructField("Id", IntegerType, nullable = false),
    StructField("Container", StringType, nullable = false),
    StructField("FileName", StringType, nullable = false),
    StructField("StatusId", IntegerType, nullable = false),
    StructField("ProcessDt", TimestampType),
    StructField("BlobSize", LongType),
    StructField("ContentType", StringType),
    StructField("ETag", StringType)))

  object FileStatus {
    val NotSeen = 1
    val InProgress = 2
    val Success = 3
    val Failed = 4
  }

  // typed entity views for Dataset[T] use at the boundaries
  case class Provider(Id: Int, Name: String, CreateDt: Timestamp)
  case class ProcessFileRow(Id: Int, Container: String, FileName: String, StatusId: Int,
      ProcessDt: Timestamp, BlobSize: Option[Long], ContentType: Option[String], ETag: Option[String])

  case class StagingSummary(providers: Long, products: Long, providerProducts: Long)
  case class ProcessingResult(status: Boolean, message: String)
  case class InvoiceProcessingResult(status: Boolean, message: String,
      productsExtracted: Long, csvFilename: Option[String], outputContainer: Option[String])
}
