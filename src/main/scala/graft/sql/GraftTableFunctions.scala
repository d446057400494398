package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.sources.AtomicWarehouse

/** SQL table functions over the warehouse, registered by
  * [[graft.GraftExtensions]] — Delta's `table_changes` shape:
  *
  * {{{
  * SELECT * FROM graft_changes('/data/wh', 'facts/orders', 0, 7)
  * }}}
  *
  * yields the table's row-level changes in versions (from, to] with
  * `_change_type` / `_commit_version` labels, through the same
  * [[AtomicWarehouse.changesBetween]] the Scala CDC surface uses — so the
  * retention floor, truncate/vacuum refusals, and maintenance
  * transparency all hold for SQL consumers.
  */
object GraftTableFunctions {

  private def lit(e: Expression, what: String): Any = {
    require(e.foldable, s"graft_changes: $what must be a literal")
    e.eval()
  }

  private def str(e: Expression, what: String): String =
    String.valueOf(lit(e, what))

  private def intOf(e: Expression, what: String): Int = lit(e, what) match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => throw new IllegalArgumentException(
      s"graft_changes: $what must be an integer version, got $other")
  }

  def changes(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4,
      "graft_changes takes (warehouseRoot, table, fromVersion, toVersion)")
    val spark = SparkSession.active
    val wh = new AtomicWarehouse(spark, str(args(0), "warehouseRoot"))
    val table = str(args(1), "table")
    val schema = wh.catalogSchema(table).getOrElse(throw new IllegalStateException(
      s"$table has no manifest-recorded schema — not a warehouse table"))
    wh.changesBetween(table, schema,
        intOf(args(2), "fromVersion"), intOf(args(3), "toVersion"))
      .queryExecution.analyzed
  }
}
