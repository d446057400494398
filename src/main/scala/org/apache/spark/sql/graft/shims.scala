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
}
