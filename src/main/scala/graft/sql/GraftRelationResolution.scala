package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{broadcast, col, element_at, split}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.StructType

import graft.sources.AtomicWarehouse

/** Analyzer rule (injected by [[graft.GraftExtensions]]) that swaps every
  * [[GraftTable]] V2 relation for the engine-built read plan:
  *
  *   - a native parquet [[HadoopFsRelation]] over a [[GraftFileIndex]], so
  *     Catalyst's `FileSourceStrategy` hands data filters to the MANIFEST
  *     (stats / dictionary value sets / Bloom sidecars prune files before
  *     any open) while the scan stays the vectorized reader inside
  *     WholeStageCodegen;
  *   - the logical→physical column mapping projected back (rename support);
  *   - deletion vectors applied as the same broadcast anti-join on
  *     `(_metadata file leaf, row ordinal)` the Scala read path uses;
  *   - `VERSION AS OF` routed through [[AtomicWarehouse.readAt]].
  *
  * The rewrite aliases the engine plan's output to the V2 relation's
  * attribute ids, so references elsewhere in the query keep resolving.
  */
case class GraftRelationResolution(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // row-level commands route their TARGET through the V2 connector
    // surface, not a read plan — rewriting it into a file relation here
    // would leave DataSourceV2Strategy nothing to plan. DELETE on a graft
    // table resolves HERE to the filter-pushed command (the table is
    // deletable but deliberately not V2-readable, so Spark's own
    // OptimizeMetadataOnlyDeleteFromTable would be preempted by the scan
    // builder's asReadable); untranslatable conditions stay put and
    // surface Spark's own unsupported-delete error.
    case d @ logical.DeleteFromTable(target, cond) if d.resolved &&
        (org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(target) match {
          case r: DataSourceV2Relation => r.table.isInstanceOf[GraftTable]
          case _ => false
        }) =>
      val r = org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(target)
        .asInstanceOf[DataSourceV2Relation]
      val preds = splitConjunctivePredicates(cond).map(shims.translateFilterV2)
      if (preds.forall(_.isDefined) &&
          r.table.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsDeleteV2]
            .canDeleteWhere(preds.flatten.toArray))
        logical.DeleteFromTableWithFilters(r, preds.flatten)
      else d
    case _: logical.DeleteFromTable => plan
    case _: logical.UpdateTable => plan
    case _: logical.MergeIntoTable => plan
    case _ => plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        val built = GraftRelationResolution.planFor(spark, t)
        val aliased: Seq[NamedExpression] = r.output.zip(built.output).map {
          case (o, n) => Alias(n, o.name)(exprId = o.exprId)
        }
        Project(aliased, built)
    }
  }
}

object GraftRelationResolution {

  /** The analyzed engine plan reading `t` (current or as-of version). */
  private[sql] def planFor(spark: SparkSession, t: GraftTable): LogicalPlan =
    dfFor(spark, t).queryExecution.analyzed

  private[sql] def dfFor(spark: SparkSession, t: GraftTable): DataFrame = {
    val wh = t.wh
    val table = t.tableName
    val schema = t.tableSchema
    t.asOfVersion match {
      case Some(v) => wh.readAt(table, schema, v)
      case None =>
        val files = wh.visibleDataFiles(table)
        if (files.exists(_.contains("/")))
          // hive-partition-dir layout: partition values live in the path,
          // which needs discovery-based listing — route through the
          // engine's basePath read (correct, no manifest pruning; DV
          // operations already refuse this layout)
          wh.read(table, schema)
        else {
          val m = wh.columnMap(table) // logical -> physical
          val physSchema = StructType(schema.fields.map(f =>
            f.copy(name = m.getOrElse(f.name, f.name))))
          val index = new GraftFileIndex(wh, table,
            physToLogical = m.map(_.swap))
          val relation = HadoopFsRelation(
            location = index,
            partitionSchema = new StructType(),
            dataSchema = physSchema,
            bucketSpec = None,
            fileFormat = new ParquetFileFormat,
            options = Map.empty)(
            spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
          val base = shims.ofRows(spark, LogicalRelation(relation, isStreaming = false))
          val dvs = wh.deletionVectors(table)
          val alive =
            if (dvs.isEmpty) base
            else {
              // identical seam to AtomicWarehouse.readTagged: DV'd rows are
              // identified by (file leaf name, ordinal) and anti-joined out
              // via one broadcast — non-DV files pass untouched, so one scan
              // covers both populations
              val tagged = base
                .withColumn("__file",
                  element_at(split(col("_metadata.file_path"), "/"), -1))
                .withColumn("__ord", col("_metadata.row_index"))
              val tombs = dvs.toSeq.flatMap { case (f, ords) => ords.map(o => (f, o)) }
              import spark.implicits._
              val tombDf = tombs.toDF("__dv_file", "__dv_ord")
              tagged.join(broadcast(tombDf),
                tagged("__file") === tombDf("__dv_file") &&
                  tagged("__ord") === tombDf("__dv_ord"),
                "left_anti")
            }
          alive.select(schema.fields.toSeq.map(f =>
            col(m.getOrElse(f.name, f.name)).as(f.name)): _*)
        }
    }
  }
}
