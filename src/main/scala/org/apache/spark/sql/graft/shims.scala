package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst [[Expression]]s and the public
  * [[Column]] API. Spark 4 routes Column construction through ColumnNodes and
  * keeps the Expression⇄Column converters `private[sql]`, so this one-file shim
  * lives under `org.apache.spark.sql` — the standard pattern for third-party
  * extensions that ship native expressions.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over an arbitrary logical plan — `Dataset.ofRows` is
    * `private[sql]`; the SQL catalog's relation builder needs it to splice
    * engine-built plans into analyzer rewrites.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Catalyst expression → V2 filter Predicate (`DataSourceV2Strategy` is
    * `private[sql]`) — the SQL catalog's DELETE rewrite uses it to decide
    * whether a condition reaches the engine's delete surface.
    */
  def translateFilterV2(e: Expression)
      : Option[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    org.apache.spark.sql.execution.datasources.v2.DataSourceV2Strategy.translateFilterV2(e)

  /** Broadcast the session's Hadoop configuration for executor-side
    * FileSystem access (`SerializableConfiguration` is `private[spark]`) —
    * the distributed deletion-vector reader streams sidecar files on
    * executors and needs the same conf the driver's FS was built with.
    */
  def broadcastHadoopConf(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration] =
    org.apache.spark.util.SerializableConfiguration.broadcast(
      spark.sparkContext, spark.sparkContext.hadoopConfiguration)

  /** Spark's own parquet row reader as a serializable per-file function —
    * what the streaming source's [[org.apache.spark.sql.connector.read
    * .PartitionReaderFactory]] runs on executors.
    * `buildReaderWithPartitionValues` is `private[sql]`; built from an
    * isolated session with the VECTORIZED reader disabled, because in the
    * batch-returning regime the function's Iterator[InternalRow] actually
    * yields ColumnarBatch (the FileScanRDD contract) — the row regime is
    * the one with the honest signature. Missing columns null-fill
    * (schema-evolution windows), the session's parquet conf (timezone,
    * nanosAsLong) carries through.
    */
  def parquetRowReader(spark: org.apache.spark.sql.SparkSession,
      requiredSchema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.execution.datasources.PartitionedFile =>
        Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
      .buildReaderWithPartitionValues(
        ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        dataSchema = requiredSchema,
        partitionSchema = new org.apache.spark.sql.types.StructType(),
        requiredSchema = requiredSchema,
        filters = Nil,
        options = Map.empty,
        hadoopConf = ss.sessionState.newHadoopConf())
  }

  /** A [[PartitionedFile]] for one whole file (`private[sql]` constructor). */
  def partitionedFile(path: String, fileSize: Long, modificationTime: Long)
      : org.apache.spark.sql.execution.datasources.PartitionedFile =
    org.apache.spark.sql.execution.datasources.PartitionedFile(
      partitionValues = org.apache.spark.sql.catalyst.InternalRow.empty,
      filePath = org.apache.spark.paths.SparkPath.fromPathString(path),
      start = 0L,
      length = fileSize,
      locations = Array.empty,
      modificationTime = modificationTime,
      fileSize = fileSize)
}
