package graft.sql

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.AtomicWarehouse

/** The warehouse's MAINTENANCE surface as SQL stored procedures (Spark 4's
  * `ProcedureCatalog` — the Iceberg `CALL` shape), so an ops user at a SQL
  * prompt can fix what `DESCRIBE`/`history` shows without a Scala build:
  *
  * {{{
  * CALL graft.system.optimize('facts.orders')                -- small-file compaction
  * CALL graft.system.optimize('facts.orders', 'compact_dv')  -- fold dense deletion vectors
  * CALL graft.system.optimize('facts.orders', 'recluster')   -- re-band the eroded tail
  * CALL graft.system.history('facts.orders')                 -- DESCRIBE HISTORY
  * CALL graft.system.restore('facts.orders', 3)              -- rewind to version 3
  * CALL graft.system.vacuum()                                -- reclaim unreferenced files
  * CALL graft.system.purge_changes('facts.orders', 5)        -- change-feed retention
  * }}}
  *
  * Every procedure routes through the SAME engine method the Scala API
  * exposes (conflict contracts, FK RESTRICT, cdfnoop markers all apply)
  * and returns the engine's literal result as rows — routing counts are
  * observable from SQL exactly as from Scala.
  */
object GraftProcedures {

  private val SystemNs = Array("system")

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(SystemNs))
      Array("optimize", "vacuum", "restore", "history", "purge_changes", "detail")
        .map(Identifier.of(SystemNs, _))
    else Array.empty

  def load(wh: AtomicWarehouse, schemaOf: String => StructType,
      ident: Identifier): UnboundProcedure = {
    if (!ident.namespace().sameElements(SystemNs))
      throw new IllegalArgumentException(
        s"no procedure namespace '${ident.namespace().mkString(".")}' — " +
          "graft procedures live under `system`")
    // SQL names tables with dots; the warehouse path-segments them
    def tbl(s: String): String = s.replace('.', '/')
    ident.name() match {
      case "optimize" => new Proc("optimize",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("mode", StringType).defaultValue("'compact'").build(),
          ProcedureParameter.in("threshold", DoubleType).defaultValue("-1.0").build()),
        StructType(Seq(StructField("mode", StringType),
          StructField("files_rewritten", IntegerType),
          StructField("files_untouched", IntegerType),
          StructField("bytes_rewritten", LongType)))) {
        override def exec(in: InternalRow): Seq[InternalRow] = {
          val t = tbl(in.getUTF8String(0).toString)
          val mode = in.getUTF8String(1).toString
          val threshold = in.getDouble(2)
          val schema = schemaOf(t)
          val r = mode match {
            case "compact" =>
              wh.compactSmall(t, schema,
                minBytes = if (threshold > 0) threshold.toLong else 16L << 20)
            case "compact_dv" =>
              wh.compactDv(t, schema,
                minDeadFraction = if (threshold > 0) threshold else 0.1)
            case "recluster" =>
              val cols = wh.clusterBy(t).getOrElse(throw new IllegalArgumentException(
                s"optimize('$t','recluster') needs declared cluster columns — " +
                  "ALTER TABLE ... CLUSTER BY first"))
              wh.reclusterIncremental(t, schema, cols,
                maxOverlap = if (threshold > 0) threshold.toInt else 2)
            case other => throw new IllegalArgumentException(
              s"unknown optimize mode '$other' (compact | compact_dv | recluster)")
          }
          Seq(InternalRow(UTF8String.fromString(mode),
            r.filesRewritten, r.filesUntouched, r.bytesRewritten))
        }
      }
      case "vacuum" => new Proc("vacuum",
        Seq(ProcedureParameter.in("older_than_ms", LongType)
          .defaultValue("-1").build()),
        StructType(Seq(StructField("vacuumed", BooleanType)))) {
        override def exec(in: InternalRow): Seq[InternalRow] = {
          val ms = in.getLong(0)
          if (ms < 0) wh.vacuum() else wh.vacuum(ms)
          Seq(InternalRow(true))
        }
      }
      case "restore" => new Proc("restore",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("version", IntegerType).build()),
        StructType(Seq(StructField("table", StringType),
          StructField("restored_to", IntegerType)))) {
        override def exec(in: InternalRow): Seq[InternalRow] = {
          val t = tbl(in.getUTF8String(0).toString)
          val v = in.getInt(1)
          wh.restore(t, v)
          Seq(InternalRow(UTF8String.fromString(t), v))
        }
      }
      case "history" => new Proc("history",
        Seq(ProcedureParameter.in("table", StringType).defaultValue("''").build()),
        StructType(Seq(StructField("version", IntegerType),
          StructField("snapshot", BooleanType),
          StructField("commit_ms", LongType),
          StructField("lines", IntegerType)))) {
        override def exec(in: InternalRow): Seq[InternalRow] = {
          val t = in.getUTF8String(0).toString
          wh.commitHistory(if (t.isEmpty) None else Some(tbl(t)))
            .map { case (v, snap, ms, n) => InternalRow(v, snap, ms, n) }
        }
      }
      case "detail" => new Proc("detail",
        Seq(ProcedureParameter.in("table", StringType).build()),
        StructType(Seq(StructField("files", IntegerType),
          StructField("bytes", LongType),
          StructField("rows", LongType),
          StructField("files_with_stats", IntegerType),
          StructField("schema_width", IntegerType),
          StructField("head_version", IntegerType),
          StructField("dv_files", IntegerType),
          StructField("dv_rows", LongType),
          StructField("change_feed", BooleanType),
          StructField("cluster_cols", StringType),
          StructField("bloom_cols", StringType)))) {
        override def exec(in: InternalRow): Seq[InternalRow] = {
          val d = wh.describe(tbl(in.getUTF8String(0).toString))
          Seq(InternalRow(d.files, d.bytes, d.rows, d.filesWithStats,
            d.schemaWidth, d.headVersion, d.dvFiles, d.dvRows, d.changeFeed,
            UTF8String.fromString(d.clusterCols.mkString(",")),
            UTF8String.fromString(d.bloomCols.mkString(","))))
        }
      }
      case "purge_changes" => new Proc("purge_changes",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("below_version", IntegerType).build()),
        StructType(Seq(StructField("removed", IntegerType)))) {
        override def exec(in: InternalRow): Seq[InternalRow] = {
          val t = tbl(in.getUTF8String(0).toString)
          Seq(InternalRow(wh.purgeChanges(t, in.getInt(1))))
        }
      }
      case other => throw new IllegalArgumentException(
        s"no procedure 'system.$other' — " +
          "optimize | vacuum | restore | history | purge_changes | detail")
    }
  }

  /** One class is both the unbound and bound form: the parameters are
    * static, so bind() is identity. Results come back as a [[LocalScan]]
    * (driver-resident rows — every procedure's output is a routing/metrics
    * summary, never data).
    */
  private abstract class Proc(pname: String, params: Seq[ProcedureParameter],
      out: StructType) extends UnboundProcedure with BoundProcedure {
    override def name(): String = pname
    override def description(): String = s"graft $pname"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    def exec(in: InternalRow): Seq[InternalRow]
    override def call(in: InternalRow): util.Iterator[Scan] =
      util.Collections.singletonList[Scan](ResultScan(out, exec(in))).iterator()
  }

  private case class ResultScan(out: StructType, result: Seq[InternalRow])
      extends LocalScan {
    override def rows(): Array[InternalRow] = result.toArray
    override def readSchema(): StructType = out
  }
}
