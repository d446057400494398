package graft.operators

import graft.functions.{Transforms => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's single composite "query" — `apply_transformations`
  * (core/data_processor.py:121-168, SURVEY.md §2.4): a presence-conditional
  * derivation pipeline. The plan is built by inspecting `df.columns` at
  * construction time; the result is ONE narrow projection stage that
  * WholeStageCodegen fuses into a single pass over the data — no shuffle,
  * no materialization, scales linearly with input splits.
  */
object TransformPipeline {

  def apply(input: DataFrame): DataFrame = {
    var df = input

    // default review date when absent (core/data_processor.py:132-133, F14)
    if (!df.columns.contains("LastReviewDt"))
      df = df.withColumn("LastReviewDt", T.currentDateStr)

    // ordered derivations, mirroring the reference's column order exactly
    if (df.columns.contains("Price")) {
      df = df
        .withColumn("RawPrice", T.rawString(col("Price")))
        .withColumn("CleanPrice", T.cleanPrice(col("Price")))
        .withColumn("IsValidPrice", T.isValidPrice(col("Price"), col("CleanPrice")))
    }

    df = df
      .withColumn("RawLastReviewDt", T.rawString(col("LastReviewDt")))
      .withColumn("CleanLastReviewDt", T.inferDate(col("LastReviewDt")))

    if (df.columns.contains("Description")) {
      df = df
        .withColumn("RawDescription", T.rawString(col("Description")))
        .withColumn("CleanDescription", T.cleanDescription(col("Description")))
        .withColumn("Measure", T.extractMeasure(col("Description")))
        .withColumn("UnitOfMeasure", lower(T.extractUnit(col("Description"))))
        .withColumn("PackageUnits", T.extractPackageUnits(col("Description")))
      if (!df.columns.contains("PercentageIVA"))
        df = df.withColumn("PercentageIVA", T.extractIva(col("Description")))
    }

    if (df.columns.contains("ProviderName")) {
      df = df
        .withColumn("RawProviderName", T.rawString(col("ProviderName")))
        .withColumn("CleanProviderName", T.cleanProviderName(col("ProviderName")))
    }

    // P4 — dropna(how='all') (core/data_processor.py:163)
    df.na.drop("all")
  }
}
