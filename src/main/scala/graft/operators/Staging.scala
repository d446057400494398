package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

/** Batch normalization into the three staging projections
  * (core/etl_orchestrator.py:61-165: insert_providers/products/
  * provider_products_to_staging). All three are narrow projections of the
  * transformed frame except the provider dedup (A1), which is the pipeline's
  * one aggregation — a hash-distinct whose shuffle AQE coalesces; at scale
  * the distinct's key cardinality is provider-count (tiny), so partial
  * aggregation collapses it map-side.
  */
object Staging {

  final case class StagingBatch(
      provider: DataFrame,
      product: DataFrame,
      providerProduct: DataFrame,
      batchGuid: String)

  private def colOrNull(df: DataFrame, name: String) =
    if (df.columns.contains(name)) col(name) else lit(null).cast(StringType)

  /** Build the staging frames for one batch. `batchGuid` scopes rows the way
    * the reference's Staging.* tables are scoped (F16, GUID per batch).
    */
  def build(transformed: DataFrame, batchGuid: String): StagingBatch = {
    val guid = lit(batchGuid).as("BatchGuid")

    // A1 + P5: one staging row per distinct non-null provider per batch
    val provider = transformed
      .filter(col("CleanProviderName").isNotNull)
      .select(col("CleanProviderName").as("Name"))
      .distinct()
      .select(col("Name"), guid)

    // P2 + P3: product projection with constant UnitPrice=0
    val product = transformed.select(
      colOrNull(transformed, "RawDescription").as("Description"),
      lit(BigDecimal(0)).cast(DecimalType(18, 2)).as("UnitPrice"),
      colOrNull(transformed, "Measure").as("Measure"),
      colOrNull(transformed, "UnitOfMeasure").as("UnitOfMeasure"),
      guid)

    // bridge rows carry names; ids are resolved at merge time (placeholder 0,
    // core/etl_orchestrator.py:150-152)
    val providerProduct = transformed.select(
      lit(0).as("ProductId"),
      lit(0).as("ProviderId"),
      colOrNull(transformed, "CleanLastReviewDt").as("LastReviewDt"),
      colOrNull(transformed, "PackageUnits").as("PackageUnits"),
      colOrNull(transformed, "PercentageIVA").as("IVA"),
      colOrNull(transformed, "RawDescription").as("ProductDescription"),
      colOrNull(transformed, "CleanProviderName").as("ProviderName"),
      colOrNull(transformed, "CleanPrice").as("Price"),
      lit(false).as("IsValidated"),
      guid)

    StagingBatch(provider, product, providerProduct, batchGuid)
  }
}
