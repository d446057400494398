package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.shims

import graft.sources.FilePred

/** `UPDATE graft.ns.t SET ... WHERE ...` resolved to the engine's
  * copy-on-write [[graft.sources.AtomicWarehouse.updateWhere]] — the WHERE
  * translated into the [[FilePred]] algebra at analysis time (manifest
  * pruning confines the rewrite to matching files), the SET expressions
  * re-rooted as plain Columns over the row.
  */
case class GraftUpdateCommand(t: GraftTable, preds: Seq[FilePred],
    sets: Seq[(String, Column)]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    t.wh.updateWhere(t.tableName, t.tableSchema, preds, sets)
    Nil
  }
}

/** `DELETE FROM graft.ns.t WHERE <outside the FilePred algebra>` — the
  * correct fallback instead of a refusal: every candidate file the
  * TRANSLATABLE conjuncts can't exclude is read once and copy-on-write
  * rewritten with the EXACT row condition applied
  * ([[graft.sources.AtomicWarehouse.deleteWhereExpr]]) — the cost pruning
  * couldn't have helped anyway. Refusal stays reserved for subqueries and
  * nondeterminism (the analyzer rule never builds this command for those).
  */
case class GraftDeleteRowsCommand(t: GraftTable, cond: Column,
    prune: Seq[FilePred]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    t.wh.deleteWhereExpr(t.tableName, t.tableSchema, cond, prune)
    Nil
  }
}

/** `UPDATE ... WHERE <outside the FilePred algebra>` — the same fallback
  * shape as [[GraftDeleteRowsCommand]] over
  * [[graft.sources.AtomicWarehouse.updateWhereExpr]].
  */
case class GraftUpdateRowsCommand(t: GraftTable, cond: Column,
    prune: Seq[FilePred], sets: Seq[(String, Column)]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    t.wh.updateWhereExpr(t.tableName, t.tableSchema, cond, sets, prune)
    Nil
  }
}

/** `ALTER TABLE graft.ns.t ADD CONSTRAINT name CHECK (cond)` resolved to
  * the engine's [[graft.sources.AtomicWarehouse.addConstraint]]: existing
  * rows validate through the engine read (stats-prunable, DV-exact), then
  * every writer — SQL or Scala — enforces the declaration.
  */
case class GraftAddCheckCommand(t: GraftTable, constraintName: String,
    conditionSql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    t.wh.addConstraint(t.tableName, constraintName, conditionSql, t.tableSchema)
    Nil
  }
}

/** `MERGE INTO graft.ns.t t USING src s ON t.k = s.k WHEN ...` resolved to
  * the engine's [[graft.sources.AtomicWarehouse.mergeInto]]: exact-key-set
  * candidate pruning, the SQL cardinality rule, change-feed recording, and
  * engine invariants all apply to SQL merges — the reference's MERGE
  * stored procedures in their native tongue. The source plan re-analyzes
  * through the normal read path (so a graft catalog source prunes too).
  */
case class GraftMergeCommand(t: GraftTable, source: LogicalPlan,
    keyCols: Seq[String], upd: Seq[(String, Column)], updWhen: Option[Column],
    del: Option[Column], insertUnmatched: Boolean, insWhen: Option[Column],
    insAssign: Seq[(String, Column)] = Nil,
    nmbsUpd: Seq[(String, Column)] = Nil,
    nmbsUpdWhen: Option[Column] = None,
    nmbsDel: Option[Column] = None,
    nmbsPrune: Seq[graft.sources.FilePred] = Nil,
    evolve: Seq[(String, org.apache.spark.sql.types.DataType)] = Nil)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    // WITH SCHEMA EVOLUTION, atomically: the extra columns are VALIDATED
    // up front (a retried statement finds them already present with the
    // same type and skips; a TYPE conflict refuses loudly rather than
    // widening; the column-map admission rules apply) but NOT committed —
    // the merge rewrite records its output schema in its own manifest
    // line, so the adoption lands in the SAME commit as the row changes
    // and a failed merge (duplicate source keys, FK refusal, lost race)
    // leaves no stray schema change behind. Pre-merge files null-fill the
    // new columns exactly as a committed addColumn's would.
    evolve.foreach { case (n, dt) =>
      t.wh.currentSchema(t.tableName).flatMap(_.fields.find(_.name == n)) match {
        case Some(f) if f.dataType == dt => // already adopted (retry)
        case Some(f) => throw new IllegalStateException(
          s"MERGE WITH SCHEMA EVOLUTION: column '$n' exists as ${f.dataType}, " +
            s"source has $dt — evolution never rewrites a column's type")
        case None => t.wh.validateAddColumn(t.tableName, n)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(
      t.tableSchema.fields ++ evolve.map { case (n, dt) =>
        org.apache.spark.sql.types.StructField(n, dt, nullable = true) })
    t.wh.mergeInto(t.tableName, schema, shims.ofRows(spark, source),
      keyCols, whenMatchedUpdate = upd, whenMatchedDelete = del,
      updateWhen = updWhen, insertUnmatched = insertUnmatched,
      insertWhen = insWhen, insertAssign = insAssign,
      notMatchedBySourceUpdate = nmbsUpd, nmbsUpdateWhen = nmbsUpdWhen,
      notMatchedBySourceDelete = nmbsDel, nmbsPrune = nmbsPrune)
    // the one path that commits nothing (empty source, no NMBS clause):
    // adopt metadata-only then — it is the statement's only effect
    evolve.foreach { case (n, dt) =>
      if (!t.wh.currentSchema(t.tableName).exists(_.fieldNames.contains(n)))
        t.wh.addColumn(t.tableName, n, dt)
    }
    Nil
  }
}
