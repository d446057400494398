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
  * CALL graft.system.sketch_refresh('cust', 'distinct',
  *   'facts.orders', 'o_orderstatus', 'o_custkey')           -- define + refresh sketch MV
  * CALL graft.system.sketch_refresh('cust')                  -- later refreshes: name-only
  * CALL graft.system.sketch_overlap('a.users', 'uid',
  *   'b.users', 'uid')                                       -- theta set algebra, one row
  * CALL graft.system.top_tokens('docs.corpus', 'text', 20)   -- bounded-state heavy hitters
  * CALL graft.system.clone('facts.orders', 'sandbox.orders') -- as-of snapshot copy
  * CALL graft.system.replica_seed('/src/wh', 'facts.t', 'facts.t', 'id')
  * CALL graft.system.replica_refresh('/src/wh', 'facts.t', 'facts.t', 'id')
  * }}}
  *
  * Sketch ESTIMATES are read with plain SELECT over the MV's state table
  * (`SELECT grp, hll_sketch_estimate(sk) FROM cat.mv.<name>.SketchState` —
  * Spark's Datasketches functions are SQL built-ins), so the per-group
  * state stays in a scan; only refresh/define is a procedure.
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
      Array("optimize", "vacuum", "restore", "history", "purge_changes", "detail",
        "sketch_refresh", "sketch_overlap", "top_tokens", "clone",
        "replica_seed", "replica_refresh")
        .map(Identifier.of(SystemNs, _))
    else Array.empty

  def load(wh: AtomicWarehouse, schemaOf: String => StructType,
      names: () => Map[String, String], ident: Identifier): UnboundProcedure = {
    if (!ident.namespace().sameElements(SystemNs))
      throw new IllegalArgumentException(
        s"no procedure namespace '${ident.namespace().mkString(".")}' — " +
          "graft procedures live under `system`")
    // SQL names tables with dots; the warehouse path-segments them, and a
    // RENAMEd table's logical name resolves to its physical directory
    def tbl(s: String): String = {
      val l = s.replace('.', '/')
      names().getOrElse(l, l)
    }
    // A WRITE target must mirror createTable's rename-map guards: writing
    // the raw dotted-to-slashed directory of a name that is a live logical
    // name (a rename-map KEY) would be permanently SHADOWED — catalog
    // resolution prefers the map, so SELECT on the name returns the other
    // table while the written data is unreachable. A name that is a map
    // VALUE is a renamed-away directory still holding that table's manifest
    // history. Both are refused with the route named.
    def writeTarget(s: String): String = {
      val dst = s.replace('.', '/')
      val m = names()
      if (m.contains(dst)) throw new IllegalArgumentException(
        s"target '$dst' is currently a logical name mapped to '${m(dst)}' by " +
          "RENAME — writing its raw directory would be shadowed by the rename " +
          "map; pick another name, or rename that table back first")
      if (m.valuesIterator.contains(dst)) throw new IllegalArgumentException(
        s"target '$dst' is the renamed-away directory of another table (its " +
          "manifest history lives there) — pick another name, or rename that " +
          "table back first")
      dst
    }
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
      // ---- the sketch layer's SQL surface: refresh is a CALL (the MV
      // definition is persisted next to its state, so later refreshes are
      // name-only and a drifted redefinition is refused, not silently
      // blended); ESTIMATES are read with plain SELECT + Spark's built-in
      // sketch functions over the state table the refresh maintains, e.g.
      //   SELECT grp, hll_sketch_estimate(sk) FROM cat.mv.<name>.SketchState
      // — the state is KB-per-group data, which belongs in a scan, not in a
      // procedure's driver-resident result rows.
      case "sketch_refresh" => new Proc("sketch_refresh",
        Seq(ProcedureParameter.in("name", StringType).build(),
          ProcedureParameter.in("kind", StringType).defaultValue("''").build(),
          ProcedureParameter.in("table", StringType).defaultValue("''").build(),
          ProcedureParameter.in("group_cols", StringType).defaultValue("''").build(),
          ProcedureParameter.in("value_col", StringType).defaultValue("''").build(),
          ProcedureParameter.in("param", IntegerType).defaultValue("-1").build()),
        StructType(Seq(StructField("name", StringType),
          StructField("kind", StringType),
          StructField("state_table", StringType),
          StructField("cursor", IntegerType)))) {
        override def exec(in: InternalRow): Seq[InternalRow] = {
          val name = in.getUTF8String(0).toString
          val defTable = s"mv/$name/SketchDef"
          val defSchema = StructType(Seq(
            StructField("kind", StringType), StructField("src", StringType),
            StructField("group_cols", StringType),
            StructField("value_col", StringType),
            StructField("param", IntegerType)))
          val given = (in.getUTF8String(1).toString, tbl(in.getUTF8String(2).toString),
            in.getUTF8String(3).toString, in.getUTF8String(4).toString, in.getInt(5))
          val (kind, src, groupCsv, valueCol, param) =
            if (wh.exists(defTable)) {
              val d = wh.read(defTable, defSchema).head()
              val stored = (d.getString(0), d.getString(1), d.getString(2),
                d.getString(3), d.getInt(4))
              // param participates in drift whenever the caller supplies one:
              // a same-shape redefinition at a different lgK/k would silently
              // keep the stored param, contradicting the refusal contract
              if (given._1.nonEmpty &&
                  ((given._1, given._2, given._3, given._4) !=
                    (stored._1, stored._2, stored._3, stored._4) ||
                   (given._5 > 0 && given._5 != stored._5)))
                throw new IllegalArgumentException(
                  s"sketch MV '$name' is already defined as kind=${stored._1} " +
                    s"table=${stored._2} group_cols=${stored._3} " +
                    s"value_col=${stored._4} param=${stored._5}" +
                    " — a redefinition would blend two views' state; DROP the mv." +
                    s"$name.* tables first")
              stored
            } else {
              if (given._1.isEmpty || given._2.isEmpty || given._3.isEmpty ||
                  given._4.isEmpty)
                throw new IllegalArgumentException(
                  s"sketch MV '$name' does not exist yet — first call needs " +
                    "(name, kind, table, group_cols, value_col)")
              val p = if (given._5 > 0) given._5
                else if (given._1 == "distinct") 12 else 200
              val d = (given._1, given._2, given._3, given._4, p)
              wh.replace(defTable, wh.spark.createDataFrame(
                util.Arrays.asList(org.apache.spark.sql.Row(d._1, d._2, d._3, d._4, d._5)),
                defSchema))
              d
            }
          val groups = groupCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val mv: graft.operators.SketchMv = kind match {
            case "distinct" => new graft.operators.SketchDistinct(
              wh, name, src, schemaOf(src), groups, valueCol, lgK = param)
            case "quantile" => new graft.operators.SketchQuantile(
              wh, name, src, schemaOf(src), groups, valueCol, k = param)
            case other => throw new IllegalArgumentException(
              s"unknown sketch kind '$other' (distinct | quantile)")
          }
          val cur = mv.refresh()
          Seq(InternalRow(UTF8String.fromString(name), UTF8String.fromString(kind),
            UTF8String.fromString(mv.stateTable.replace('/', '.')), cur))
        }
      }
      case "sketch_overlap" => new Proc("sketch_overlap",
        Seq(ProcedureParameter.in("table_a", StringType).build(),
          ProcedureParameter.in("key_a", StringType).build(),
          ProcedureParameter.in("table_b", StringType).build(),
          ProcedureParameter.in("key_b", StringType).build(),
          ProcedureParameter.in("lg_k", IntegerType).defaultValue("12").build()),
        StructType(Seq(StructField("est_a", LongType),
          StructField("est_b", LongType),
          StructField("est_intersection", LongType),
          StructField("est_union", LongType),
          StructField("est_diff_a", LongType)))) {
        override def exec(in: InternalRow): Seq[InternalRow] = {
          val (ta, tb) = (tbl(in.getUTF8String(0).toString),
            tbl(in.getUTF8String(2).toString))
          val r = graft.operators.SketchSetOps.overlap(
            wh.read(ta, schemaOf(ta)), in.getUTF8String(1).toString,
            wh.read(tb, schemaOf(tb)), in.getUTF8String(3).toString,
            lgK = in.getInt(4)).head()
          Seq(InternalRow(r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
        }
      }
      case "top_tokens" => new Proc("top_tokens",
        Seq(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("text_col", StringType).build(),
          ProcedureParameter.in("k", IntegerType).build(),
          ProcedureParameter.in("capacity", IntegerType).defaultValue("4096").build()),
        StructType(Seq(StructField("token", StringType),
          StructField("cnt", LongType)))) {
        override def exec(in: InternalRow): Seq[InternalRow] = {
          val t = tbl(in.getUTF8String(0).toString)
          graft.operators.Corpus.topTokensSketch(wh.read(t, schemaOf(t)),
              in.getUTF8String(1).toString, k = in.getInt(2),
              capacity = in.getInt(3))
            .collect() // ≤ k rows by construction — a bounded CALL result
            .map(r => InternalRow(UTF8String.fromString(r.getString(0)), r.getLong(1)))
            .toSeq
        }
      }
      // ---- snapshot clone: a consistent as-of copy with history
      // truncation — the bulk-copy ergonomic RENAME no longer needs (rename
      // is one metadata commit now) but replica seeding and dev-sandbox
      // forks still do. Data + current logical schema only (the clone's
      // history starts at version 1; declare cluster/bloom/constraints on
      // the clone explicitly if wanted).
      case "clone" => new Proc("clone",
        Seq(ProcedureParameter.in("source", StringType).build(),
          ProcedureParameter.in("target", StringType).build(),
          ProcedureParameter.in("version", IntegerType).defaultValue("-1").build()),
        StructType(Seq(StructField("source", StringType),
          StructField("target", StringType),
          StructField("version", IntegerType),
          StructField("rows", LongType)))) {
        override def exec(in: InternalRow): Seq[InternalRow] = {
          val src = tbl(in.getUTF8String(0).toString)
          val dst = writeTarget(in.getUTF8String(1).toString)
          if (wh.exists(dst)) throw new IllegalArgumentException(
            s"clone target '$dst' already exists — clone never overwrites")
          val v = in.getInt(2) match {
            case n if n >= 0 => n
            case _ => wh.versions().lastOption.getOrElse(0)
          }
          val snap = wh.readAt(src, schemaOf(src), v)
          wh.replace(dst, snap)
          val rows = wh.read(dst, schemaOf(src)).count() // footer-metadata count
          Seq(InternalRow(UTF8String.fromString(src), UTF8String.fromString(dst),
            v, rows))
        }
      }
      // ---- cross-warehouse CDC replication from SQL: seed bootstraps the
      // replica from a consistent source snapshot, refresh pulls+applies
      // the change window since the replication cursor as ONE merge —
      // graft.streaming.Replicator's exact semantics (sequence-guarded,
      // cursor in the same commit), reachable without a Scala build.
      case name @ ("replica_seed" | "replica_refresh") => new Proc(name,
        Seq(ProcedureParameter.in("source_root", StringType).build(),
          ProcedureParameter.in("source", StringType).build(),
          ProcedureParameter.in("target", StringType).build(),
          ProcedureParameter.in("key_cols", StringType).build()),
        StructType(Seq(StructField("target", StringType),
          StructField("cursor", IntegerType)))) {
        override def exec(in: InternalRow): Seq[InternalRow] = {
          val srcWh = new AtomicWarehouse(wh.spark, in.getUTF8String(0).toString)
          val src = in.getUTF8String(1).toString.replace('.', '/')
          val dst = writeTarget(in.getUTF8String(2).toString)
          val keys = in.getUTF8String(3).toString
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val schema = srcWh.catalogSchema(src).orElse(srcWh.inferSchema(src))
            .getOrElse(throw new IllegalStateException(
              s"source table $src has no readable schema"))
          val repl = new graft.streaming.Replicator(
            srcWh, src, schema, keys, wh, dst)
          val cur = if (name == "replica_seed") repl.seed() else repl.refresh()
          Seq(InternalRow(UTF8String.fromString(dst), cur))
        }
      }
      case other => throw new IllegalArgumentException(
        s"no procedure 'system.$other' — " +
          "optimize | vacuum | restore | history | purge_changes | detail | " +
          "sketch_refresh | sketch_overlap | top_tokens | clone | " +
          "replica_seed | replica_refresh")
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
