package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsWrite, Table,
  TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate,
  V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.AtomicWarehouse

/** The warehouse as a Spark catalog plugin — `spark.sql` over graft tables.
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft.root", "/data/wh")
  * spark.sql("SELECT * FROM graft.facts.orders WHERE o_orderkey = 42")
  * }}}
  *
  * Namespaces map to the warehouse's path-segmented table names
  * (`graft.facts.orders` ↔ table `facts/orders`). Reads resolve through
  * [[GraftRelationResolution]] into a native parquet relation over a
  * [[GraftFileIndex]], so every SQL filter reaches the manifest's
  * stats/value-set/Bloom file pruning and deletion vectors apply — the
  * reference's relational surface is SQL (its MERGE procedures and every
  * BI consumer; `core/etl_orchestrator.py:173-180`), and this is that
  * surface over the engine's tables. Writes (`INSERT INTO`, `INSERT
  * OVERWRITE`) route through the warehouse's transactional append/replace,
  * so CHECK/FK/UNIQUE invariants and the change feed apply to SQL writes
  * exactly as to API writes.
  *
  * `VERSION AS OF n` time travel resolves through [[AtomicWarehouse.readAt]]
  * (era-exact schema, column map and deletion vectors; no manifest pruning —
  * historical stats rode manifests that may be folded away).
  */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catName: String = _
  private var whRoot: String = _

  // one warehouse per catalog instance, built lazily so the plugin can be
  // configured before any SparkSession exists
  @transient private lazy val wh: AtomicWarehouse =
    new AtomicWarehouse(SparkSession.active, whRoot)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    require(options.containsKey("root"),
      s"catalog '$name' needs spark.sql.catalog.$name.root=<warehouse dir>")
    catName = name
    whRoot = options.get("root")
  }

  override def name(): String = catName

  /** ANSI constraint DDL (`ALTER TABLE ... ADD CONSTRAINT`) routes to V2
    * catalogs only when the catalog declares this capability.
    */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  private[sql] def warehouse: AtomicWarehouse = wh

  // ---- table-name indirection: RENAME TABLE as ONE metadata commit ------
  //
  // A graft table's physical identity IS its directory (manifest lines,
  // stats, DV/Bloom sidecars and time travel all key on the path), so the
  // directory never moves. What CAN move is the CATALOG name: `sys/graft_names`
  // is a tiny warehouse table mapping logical → physical (the column-mapping
  // idea applied at table granularity), itself manifest-committed — so a
  // rename is one crash-safe metadata commit, the renamed table keeps its
  // full history/time-travel/constraints (everything below the catalog sees
  // the unchanged physical name), and the mapping is excluded from listings
  // here (an underscore prefix would hide it, but Spark's file listing
  // treats `_`-prefixed path segments as hidden and the parquet under it
  // becomes unreadable). The vacated name stops resolving (its directory
  // still holds the renamed table's history, so re-CREATing it is refused
  // with the route named). Scala-API callers address physical names
  // directly — naming is a catalog concern, as in Spark itself.
  private val NamesTable = "sys/graft_names"
  private val namesSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("logical",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("physical",
      org.apache.spark.sql.types.StringType, nullable = false)))

  /** Current logical→physical map; empty (zero extra I/O beyond one
    * existence check) until the first rename ever happens. Cached per
    * warehouse HEAD version — planning resolves names several times per
    * query, and once a rename exists each miss would re-read the mapping
    * parquet; any commit (by this or another writer) moves the head and
    * invalidates, so a concurrent rename is visible at its commit point.
    */
  @transient @volatile private var nameMapCache: (Int, Map[String, String]) = null

  private def nameMap(): Map[String, String] = {
    if (!wh.exists(NamesTable)) return Map.empty
    val head = wh.headVersion()
    val c = nameMapCache
    if (c != null && c._1 == head) return c._2
    val m = wh.read(NamesTable, namesSchema).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    nameMapCache = (head, m)
    m
  }

  private def writeNameMap(m: Map[String, String]): Unit =
    wh.replace(NamesTable, wh.spark.createDataFrame(
      util.Arrays.asList(m.toSeq.sortBy(_._1)
        .map { case (l, p) => org.apache.spark.sql.Row(l, p) }: _*),
      namesSchema))

  private def logicalName(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  /** Resolve a logical name to its physical table. A name that is some
    * mapping's physical TARGET but not itself mapped has been renamed away:
    * it must not resolve (the old name would silently alias the renamed
    * table).
    */
  private def tableName(ident: Identifier): String = {
    val l = logicalName(ident)
    val m = nameMap()
    m.get(l) match {
      case Some(p) => p
      case None if m.valuesIterator.contains(l) => throw new NoSuchTableException(ident)
      case None => l
    }
  }

  /** The catalog-visible table set: physical tables minus renamed-away
    * directories, plus live mapped logical names.
    */
  private def effectiveTables(): Seq[String] = {
    val m = nameMap()
    val renamedAway = m.values.toSet
    (wh.catalogTables().filterNot(t => renamedAway(t) || t == NamesTable) ++
      m.collect { case (l, p) if wh.exists(p) => l }).distinct.sorted
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = namespace.mkString("/")
    effectiveTables()
      .filter(t => if (prefix.isEmpty) !t.contains("/")
        else t.startsWith(prefix + "/") && !t.stripPrefix(prefix + "/").contains("/"))
      .map(t => Identifier.of(namespace, t.split('/').last))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    try wh.exists(tableName(ident))
    catch { case _: NoSuchTableException => false }

  override def loadTable(ident: Identifier): Table = {
    val t = tableName(ident)
    if (!wh.exists(t)) throw new NoSuchTableException(ident)
    GraftTable(wh, t, resolvedSchema(t), asOfVersion = None)
  }

  /** `VERSION AS OF n` — Spark routes the literal here as a string. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = tableName(ident)
    if (!wh.exists(t)) throw new NoSuchTableException(ident)
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft time travel takes an integer commit version, got '$version'")
    }
    GraftTable(wh, t, resolvedSchema(t), asOfVersion = Some(v))
  }

  /** `TIMESTAMP AS OF ts` — Spark hands epoch MICROseconds; manifest
    * mtimes resolve it to the newest commit at or before that instant.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val t = tableName(ident)
    if (!wh.exists(t)) throw new NoSuchTableException(ident)
    GraftTable(wh, t, resolvedSchema(t),
      asOfVersion = Some(wh.versionAtTimestamp(timestamp / 1000L)))
  }

  private def resolvedSchema(t: String): StructType =
    wh.catalogSchema(t).orElse(wh.inferSchema(t)).getOrElse(
      throw new IllegalStateException(s"table $t exists but has no schema"))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft CREATE TABLE does not take PARTITIONED BY; use the Scala " +
        "appendPartitioned/clusterBy surface for layout control")
    val t = logicalName(ident)
    require(t != NamesTable, s"'$NamesTable' is reserved for the catalog's rename map")
    val m = nameMap()
    m.get(t) match {
      case Some(p) if wh.exists(p) => throw new TableAlreadyExistsException(ident)
      case Some(_) => writeNameMap(m - t) // stale entry (physical dropped): clean
      case None =>
    }
    if (m.valuesIterator.contains(t))
      throw new IllegalArgumentException(
        s"cannot CREATE TABLE '$t': its directory holds the manifest history " +
          "of a table renamed away from this name — pick another name, or " +
          "rename that table back first")
    if (wh.exists(t)) throw new TableAlreadyExistsException(ident)
    wh.replace(t, wh.spark.createDataFrame(
      wh.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    GraftTable(wh, t, schema, asOfVersion = None)
  }

  /** `ALTER TABLE` mapped onto the engine's METADATA-ONLY evolution moves —
    * every supported change is one manifest commit, zero data files
    * touched: RENAME COLUMN (column mapping), ALTER COLUMN TYPE
    * (value-preserving widening), DROP COLUMN (physical-name tombstone),
    * ADD COLUMN (nullable, null-filled from pre-add files), CLUSTER BY
    * (layout declaration for later rewrites), and ADD/DROP CONSTRAINT
    * (CHECK / UNIQUE / single-column FOREIGN KEY — validated against
    * existing rows exactly like the Scala API, then enforced on every
    * writer, SQL or not). Anything else refuses loudly rather than
    * approximating.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = tableName(ident)
    if (!wh.exists(t)) throw new NoSuchTableException(ident)
    def one(fieldNames: Array[String], what: String): String = {
      require(fieldNames.length == 1,
        s"$what on nested fields is not supported (${fieldNames.mkString(".")})")
      fieldNames(0)
    }
    changes.foreach {
      case r: TableChange.RenameColumn =>
        wh.renameColumn(t, one(r.fieldNames(), "RENAME COLUMN"), r.newName())
      case u: TableChange.UpdateColumnType =>
        wh.widenColumn(t, one(u.fieldNames(), "ALTER COLUMN TYPE"), u.newDataType())
      case d: TableChange.DeleteColumn =>
        val c = one(d.fieldNames(), "DROP COLUMN")
        val present = wh.catalogSchema(t).exists(_.fieldNames.contains(c))
        // absent + IF EXISTS → no-op; absent without it → the engine's
        // error names the live columns
        if (present || !d.ifExists()) wh.dropColumn(t, c)
      case a: TableChange.AddColumn =>
        val c = one(a.fieldNames(), "ADD COLUMN")
        require(a.isNullable, s"ADD COLUMN $c: only nullable columns add " +
          "metadata-only (pre-add files have no values to satisfy NOT NULL)")
        require(a.position() == null,
          s"ADD COLUMN $c FIRST/AFTER is not supported (columns append)")
        wh.addColumn(t, c, a.dataType())
      case cb: TableChange.ClusterBy =>
        val cols = cb.clusteringColumns().toSeq.map { nr =>
          require(nr.fieldNames().length == 1,
            "CLUSTER BY on nested fields is not supported")
          nr.fieldNames()(0)
        }
        wh.setClusterBy(t, cols)
      case ac: TableChange.AddConstraint => addConstraintChange(t, ac)
      case dc: TableChange.DropConstraint =>
        // the engine splits constraints by kind (CHECK/FK/UNIQUE); SQL
        // names one namespace — resolve by presence, each drop a no-op
        // when the name isn't of its kind
        val known = wh.constraintsOf(t).contains(dc.name()) ||
          wh.foreignKeysOf(t).contains(dc.name()) ||
          wh.uniquesOf(t).contains(dc.name())
        if (!known && !dc.ifExists()) throw new IllegalArgumentException(
          s"no constraint named '${dc.name()}' on $t")
        wh.dropConstraint(t, dc.name())
        wh.dropForeignKey(t, dc.name())
        wh.dropUniqueKey(t, dc.name())
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change ${other.getClass.getSimpleName} is not supported; " +
          "supported: RENAME COLUMN, ALTER COLUMN TYPE (widening), DROP/ADD " +
          "COLUMN, CLUSTER BY, ADD/DROP CONSTRAINT (CHECK/UNIQUE/FOREIGN KEY)")
    }
    loadTable(ident)
  }

  private def addConstraintChange(t: String,
      ac: TableChange.AddConstraint): Unit = {
    import org.apache.spark.sql.connector.catalog.constraints.{Check, ForeignKey, Unique}
    def cols(nrs: Array[org.apache.spark.sql.connector.expressions.NamedReference])
        : Seq[String] = nrs.toSeq.map { nr =>
      require(nr.fieldNames().length == 1,
        "constraints on nested fields are not supported")
      nr.fieldNames()(0)
    }
    ac.constraint() match {
      case c: Check =>
        wh.addConstraint(t, c.name(), c.predicateSql(), resolvedSchema(t))
      case u: Unique => wh.addUniqueKey(t, cols(u.columns()), u.name())
      case f: ForeignKey =>
        val (cs, ps) = (cols(f.columns()), cols(f.referencedColumns()))
        // the referenced identifier may arrive catalog-qualified
        val ns = f.referencedTable().namespace().toSeq
        val parentLogical =
          ((if (ns.headOption.contains(catName)) ns.tail else ns) :+
            f.referencedTable().name()).mkString("/")
        // a renamed parent resolves to its physical directory: FKs key on
        // the stable physical name, so later renames never break them
        val parent = nameMap().getOrElse(parentLogical, parentLogical)
        wh.addForeignKey(t, cs, parent, ps, f.name())
      case other => throw new UnsupportedOperationException(
        s"constraint '${other.toDDL}' is not supported (PRIMARY KEY implies " +
          "NOT NULL enforcement the engine does not provide — declare UNIQUE " +
          "plus a CHECK IS NOT NULL)")
    }
  }

  override def dropTable(ident: Identifier): Boolean = {
    val t = try tableName(ident)
      catch { case _: NoSuchTableException => return false }
    if (!wh.exists(t)) false
    else {
      wh.delete(t)
      // release the logical name too (a crash between the two commits
      // leaves a stale mapping that resolution treats as nonexistent and
      // createTable cleans lazily)
      val l = logicalName(ident)
      val m = nameMap()
      if (m.contains(l)) writeNameMap(m - l)
      true
    }
  }

  /** RENAME TABLE as ONE metadata commit (see the name-indirection block
    * above): the directory — and with it every retained manifest, stat,
    * sidecar and time-travel era — stays put; only the `sys/graft_names` map
    * (NOT `_sys/...` — Spark's file listing hides `_`-prefixed path segments
    * and would silently read the map as empty) changes, atomically. Renaming
    * back to the physical name drops the indirection entirely.
    */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    // the RENAME TO target can arrive catalog-qualified (the parser keeps
    // the user's qualifier on the new identifier) — same normalization as
    // FK referencedTable
    def unqualified(ident: Identifier): String = {
      val ns = ident.namespace().toSeq
      ((if (ns.headOption.contains(catName)) ns.tail else ns) :+
        ident.name()).mkString("/")
    }
    val lo = unqualified(oldIdent)
    val ln = unqualified(newIdent)
    require(lo != NamesTable && ln != NamesTable,
      s"'$NamesTable' is reserved for the catalog's rename map")
    if (lo == ln) return
    val m = nameMap()
    val phys = m.get(lo) match {
      case Some(p) if wh.exists(p) => p
      case Some(_) => throw new NoSuchTableException(oldIdent)
      case None if wh.exists(lo) && !m.valuesIterator.contains(lo) => lo
      case None => throw new NoSuchTableException(oldIdent)
    }
    val newTaken = m.get(ln) match {
      case Some(p) => wh.exists(p)
      case None => wh.exists(ln) && !m.valuesIterator.contains(ln)
    }
    if (newTaken) throw new TableAlreadyExistsException(newIdent)
    // identity entries (rename back to the directory name) need no row
    writeNameMap(((m - lo) + (ln -> phys)).filter { case (l, p) => l != p })
  }

  // ---- stored procedures: the maintenance surface ------------------------

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(wh, resolvedSchema, () => nameMap(), ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)

  // ---- namespaces: implicit path prefixes of the table names ------------

  private def allNamespaces(): Seq[Seq[String]] =
    effectiveTables().map(_.split('/').toSeq.init).filter(_.nonEmpty).distinct

  override def listNamespaces(): Array[Array[String]] =
    allNamespaces().map(_.take(1)).distinct.map(_.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val prefix = namespace.toSeq
    allNamespaces().filter(ns => ns.length > prefix.length &&
        ns.take(prefix.length) == prefix)
      .map(_.take(prefix.length + 1)).distinct.map(_.toArray).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    allNamespaces().exists(_.startsWith(namespace.toSeq))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        catName +: namespace.toSeq)
    new util.HashMap[String, String]()
  }

  /** Namespaces are implicit (path prefixes materialize with their first
    * table), so CREATE NAMESPACE is an accepted no-op.
    */
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = ()

  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val tables = effectiveTables()
      .filter(_.startsWith(namespace.mkString("/") + "/"))
    if (tables.isEmpty) false
    else if (!cascade) throw new IllegalStateException(
      s"namespace ${namespace.mkString(".")} holds ${tables.size} table(s); " +
        "use DROP NAMESPACE ... CASCADE")
    else {
      val m = nameMap()
      tables.foreach(t => wh.delete(m.getOrElse(t, t)))
      if (tables.exists(m.contains)) writeNameMap(m -- tables)
      true
    }
  }
}

/** A warehouse table surfaced through the V2 catalog. Reads never go
  * through a V2 scan: [[GraftRelationResolution]] replaces the relation
  * with the engine-built parquet plan during analysis (the Delta pattern —
  * V2 for naming and writes, V1 file relation for the read path so
  * vectorization, codegen and the manifest [[GraftFileIndex]] all engage).
  * Writes are V1 fallback writes into the transactional warehouse;
  * `DELETE FROM` routes through the engine's copy-on-write [[AtomicWarehouse
  * .deleteWhere]] when the WHERE clause translates into the [[graft.sources
  * .FilePred]] algebra — manifest file pruning decides which files rewrite,
  * FK RESTRICT and the change feed apply exactly as through the API.
  */
case class GraftTable(wh: AtomicWarehouse, tableName: String,
    tableSchema: StructType, asOfVersion: Option[Int])
    extends Table with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  override def name(): String = tableName

  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE).asJava

  /** Serves `spark.readStream.table(...)` — see [[GraftScan]]; batch
    * SELECTs resolve through [[GraftRelationResolution]] instead and never
    * build a V2 scan.
    */
  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder = {
    require(asOfVersion.isEmpty,
      s"cannot stream $tableName VERSION AS OF — offsets ARE versions; " +
        "use startingVersion to begin a stream at one")
    new GraftScanBuilder(wh, tableName, tableSchema, options)
  }

  /** WHERE-clause V2 predicates → the engine's conjunction, None when any
    * leg falls outside the algebra (Spark then reports the DELETE
    * unsupported instead of silently under- or over-deleting — the V1
    * filter bridge is deliberately NOT used: it drops unconvertible legs).
    */
  private def asPreds(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Option[Seq[graft.sources.FilePred]] = {
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, NamedReference, Expression => V2Expr}
    import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Or => V2Or, Predicate}
    import graft.sources.{ColEq, ColGe, ColGt, ColIn, ColLe, ColLt, ColOr, FilePred}
    def colName(e: V2Expr): Option[String] = e match {
      case f: NamedReference if f.fieldNames().length == 1 => Some(f.fieldNames()(0))
      // Catalyst wraps the column of a widened comparison in a cast (e.g.
      // `id IN (5, 205)` casts the int literals' column side) — an
      // IDENTITY cast (target type = the column's declared type) unwraps
      // safely; a real type change does not translate
      case c: org.apache.spark.sql.connector.expressions.Cast =>
        colName(c.expression()).filter(n =>
          tableSchema.fields.exists(f => f.name == n && f.dataType == c.dataType()))
      case _ => None
    }
    def litVal(e: V2Expr): Option[Any] = e match {
      case l: V2Literal[_] if l.value != null =>
        Some(CatalystTypeConverters.convertToScala(l.value, l.dataType))
      case _ => None
    }
    def cmp(c: V2Expr, v: V2Expr, mk: (String, Any) => FilePred): Option[Seq[FilePred]] =
      for (cn <- colName(c); lv <- litVal(v)) yield Seq(mk(cn, lv))
    def one(p: Predicate): Option[Seq[FilePred]] = p match {
      case a: V2And => for (x <- one(a.left()); y <- one(a.right())) yield x ++ y
      case o: V2Or =>
        for (x <- one(o.left()); y <- one(o.right()); if x.nonEmpty && y.nonEmpty)
          yield Seq(ColOr(Seq(x, y)))
      case _ => (p.name(), p.children()) match {
        case ("ALWAYS_TRUE", _) => Some(Nil)
        case ("=", Array(c, v)) =>
          cmp(c, v, ColEq(_, _)).orElse(cmp(v, c, ColEq(_, _)))
        case (">", Array(c, v)) =>
          cmp(c, v, ColGt(_, _)).orElse(cmp(v, c, ColLt(_, _)))
        case (">=", Array(c, v)) =>
          cmp(c, v, ColGe(_, _)).orElse(cmp(v, c, ColLe(_, _)))
        case ("<", Array(c, v)) =>
          cmp(c, v, ColLt(_, _)).orElse(cmp(v, c, ColGt(_, _)))
        case ("<=", Array(c, v)) =>
          cmp(c, v, ColLe(_, _)).orElse(cmp(v, c, ColGe(_, _)))
        case ("IN", kids) if kids.length >= 2 =>
          for {
            cn <- colName(kids.head)
            vs <- kids.tail.foldLeft(Option(Seq.empty[Any])) {
              (acc, k) => for (a <- acc; v <- litVal(k)) yield a :+ v
            }
          } yield Seq(ColIn(cn, vs))
        case _ => None
      }
    }
    predicates.foldLeft(Option(Seq.empty[FilePred])) {
      (acc, p) => for (a <- acc; b <- one(p)) yield a ++ b
    }
  }

  override def canDeleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Boolean =
    asOfVersion.isEmpty && asPreds(predicates).isDefined

  override def deleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    require(asOfVersion.isEmpty, s"cannot DELETE from $tableName VERSION AS OF")
    asPreds(predicates) match {
      case Some(Nil) => truncateTable() // DELETE FROM t — whole-table
      case Some(preds) => wh.deleteWhere(tableName, tableSchema, preds)
      case None => throw new UnsupportedOperationException(
        s"DELETE condition on $tableName falls outside the engine's " +
          "predicate algebra; use the Scala API")
    }
  }

  // the V1 bridge is never taken (the V2 overrides above win), but
  // SupportsDelete declares it abstract
  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    throw new UnsupportedOperationException("V1 delete bridge unused")

  override def truncateTable(): Boolean = {
    require(asOfVersion.isEmpty, s"cannot TRUNCATE $tableName VERSION AS OF")
    wh.replace(tableName, wh.spark.createDataFrame(
      wh.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tableSchema))
    true
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOfVersion.isEmpty, s"cannot write to $tableName VERSION AS OF")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteFlag: Boolean): Unit = {
              // V2 resolved the input by position against schema(); land it
              // under the table's own column names
              val aligned = data.toDF(tableSchema.fieldNames.toSeq: _*)
              if (overwrite) wh.replace(tableName, aligned)
              else wh.append(tableName, aligned)
            }
          }
        /** `writeStream.toTable(...)` — exactly-once epochs through the
          * (appId, batchId) manifest ledger; see [[GraftStreamingWrite]].
          */
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          require(!overwrite,
            s"streaming into $tableName supports APPEND output mode only " +
              "(complete/truncate would replace the table every epoch)")
          val appId = Option(info.options.get("txnappid")).getOrElse(info.queryId())
          new GraftStreamingWrite(wh, tableName,
            // positional resolution, as the batch path: the incoming
            // schema's names may differ, positions bind
            org.apache.spark.sql.types.StructType(
              tableSchema.fields.zip(info.schema().fields).map {
                case (t, in) => t.copy(dataType = in.dataType, nullable = in.nullable)
              }),
            appId)
        }
      }
    }
  }
}
