package graft.sql

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan,
  LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.sources.{AtomicWarehouse, ColEq, ColGe, ColGt, ColIn, ColLe,
  ColLt, ColOr, FilePred}

/** The manifest as a Catalyst [[FileIndex]] — how `spark.sql` reaches the
  * engine's data skipping. `FileSourceStrategy` hands every scan's data
  * filters to `listFiles` at physical planning; translating them into the
  * engine's [[FilePred]] algebra and routing through
  * [[AtomicWarehouse.planFiles]] gives SQL queries the same min/max /
  * dictionary-value-set / Bloom-sidecar file pruning the Scala `scanWhere`
  * API has — before a single file is opened, on every query, with the scan
  * itself staying the native vectorized parquet reader inside
  * WholeStageCodegen. (The Delta/Tahoe architecture, rebuilt on the graft
  * manifest.)
  *
  * Untranslatable filters simply don't prune (the row filter still applies
  * above the scan — pruning only decides which files open, exactly the
  * [[FilePred]] soundness contract). Attributes arrive under PHYSICAL
  * column names (the relation is built over the physical schema so the
  * footers match); `physToLogical` maps them back to the logical names
  * `planFiles` speaks.
  */
class GraftFileIndex(wh: AtomicWarehouse, table: String,
    physToLogical: Map[String, String]) extends FileIndex {

  private val tableDir = new Path(wh.path(table))
  private def fs = tableDir.getFileSystem(wh.spark.sparkContext.hadoopConfiguration)

  override def rootPaths: Seq[Path] = Seq(tableDir)

  override def partitionSchema: StructType = new StructType()

  override def refresh(): Unit = ()

  override def inputFiles: Array[String] =
    wh.visibleDataFiles(table).map(f => s"${wh.path(table)}/$f").toArray

  /** Manifest-visible bytes (what Catalyst sizes joins with — a dimension
    * table under the broadcast threshold auto-broadcasts through SQL).
    */
  override lazy val sizeInBytes: Long = statuses.values.map(_.getLen).sum

  /** File statuses from the LOG, not the filesystem: manifest-recorded
    * byte sizes (exact — captured from the footer read at commit) become
    * synthetic FileStatus entries, so SQL scan planning over a
    * million-file table costs zero namenode/object-store calls. Only
    * files whose stats lines predate size recording fall back to one
    * directory listing (flat layouts) or per-file statuses (partition
    * dirs). Synthetic entries carry modificationTime 0 — the one visible
    * consequence is `_metadata.file_modification_time` reading as epoch
    * for SQL scans that project it; a vacuumed file is caught loudly by
    * the scan task instead of a planner pre-check (same contract as the
    * streaming source).
    */
  private lazy val statuses: Map[String, FileStatus] = {
    val visible = wh.visibleDataFiles(table)
    if (visible.isEmpty) Map.empty
    else {
      val recorded = wh.recordedFileSizes(table, visible)
      val synthetic = recorded.map { case (f, len) =>
        f -> new FileStatus(len, false, 1, 0L, 0L,
          fs.makeQualified(new Path(s"${wh.path(table)}/$f")))
      }
      val rest = visible.filterNot(recorded.contains)
      val listed: Map[String, FileStatus] =
        if (rest.isEmpty) Map.empty
        else if (rest.exists(_.contains("/")))
          rest.map { f =>
            wh.streamPlanFsCalls.incrementAndGet()
            f -> fs.getFileStatus(new Path(s"${wh.path(table)}/$f"))
          }.toMap
        else { // flat layout: ONE directory listing covers every legacy file
          wh.streamPlanFsCalls.incrementAndGet()
          val wanted = rest.toSet
          fs.listStatus(tableDir).filter(_.isFile)
            .filter(s => wanted.contains(s.getPath.getName))
            .map(s => s.getPath.getName -> s).toMap
        }
      synthetic ++ listed
    }
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val preds = dataFilters.flatMap(GraftFileIndex.translate(_, physToLogical))
    val (kept, skipped) =
      if (preds.isEmpty) (wh.visibleDataFiles(table), Nil)
      else wh.planFiles(table, preds)
    GraftFileIndex.recordPlan(wh.root, table, kept.size, skipped.size)
    // a kept file missing from the lazily-snapshotted statuses map means a
    // commit landed between index construction and physical planning —
    // fetch its status fresh rather than silently under-reading; a file
    // that truly vanished (vacuumed) fails loudly here instead of
    // returning missing rows
    Seq(PartitionDirectory(InternalRow.empty,
      kept.map(f => statuses.getOrElse(f,
        fs.getFileStatus(new Path(s"${wh.path(table)}/$f")))).toArray))
  }
}

object GraftFileIndex {

  /** Last pruning decision per (warehouse root, table) — the observable
    * specs and driver queries assert skipping through `spark.sql` with
    * (plans don't expose the manifest's kept/skipped split).
    */
  private val lastPlans =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (Int, Int)]()

  private def recordPlan(root: String, table: String, kept: Int, skipped: Int): Unit =
    lastPlans.put((root, table), (kept, skipped))

  /** (filesRead, filesSkipped) of the most recent SQL scan planning over
    * `table`, None before any scan ran.
    */
  def lastPlanFor(root: String, table: String): Option[(Int, Int)] =
    Option(lastPlans.get((root, table)))

  /** Catalyst filter → [[FilePred]], or None when outside the algebra
    * (non-literal comparands, unsupported operators, complex children).
    * Conjunctions arrive pre-split in `dataFilters`; nested And appears
    * only under Or, where both branches must fully translate — a partial
    * disjunct would over-skip.
    */
  private[sql] def translate(e: Expression,
      physToLogical: Map[String, String]): Option[FilePred] = {
    def colOf(a: Attribute): String = physToLogical.getOrElse(a.name, a.name)
    // analysis-time expressions carry literals wrapped in (foldable)
    // casts — constant folding only runs in the optimizer. Fold here so
    // `id >= 3` translates whether 3 arrived bare or as cast(3 as bigint).
    object Lit {
      def unapply(x: Expression): Option[Literal] = x match {
        case l: Literal => Some(l)
        case _ if x.foldable => Some(Literal.create(x.eval(), x.dataType))
        case _ => None
      }
    }
    def scalaVal(l: Literal): Any =
      CatalystTypeConverters.convertToScala(l.value, l.dataType)
    e match {
      case EqualTo(a: Attribute, Lit(l)) if l.value != null =>
        Some(ColEq(colOf(a), scalaVal(l)))
      case EqualTo(Lit(l), a: Attribute) if l.value != null =>
        Some(ColEq(colOf(a), scalaVal(l)))
      case GreaterThan(a: Attribute, Lit(l)) if l.value != null =>
        Some(ColGt(colOf(a), scalaVal(l)))
      case GreaterThan(Lit(l), a: Attribute) if l.value != null =>
        Some(ColLt(colOf(a), scalaVal(l)))
      case GreaterThanOrEqual(a: Attribute, Lit(l)) if l.value != null =>
        Some(ColGe(colOf(a), scalaVal(l)))
      case GreaterThanOrEqual(Lit(l), a: Attribute) if l.value != null =>
        Some(ColLe(colOf(a), scalaVal(l)))
      case LessThan(a: Attribute, Lit(l)) if l.value != null =>
        Some(ColLt(colOf(a), scalaVal(l)))
      case LessThan(Lit(l), a: Attribute) if l.value != null =>
        Some(ColGt(colOf(a), scalaVal(l)))
      case LessThanOrEqual(a: Attribute, Lit(l)) if l.value != null =>
        Some(ColLe(colOf(a), scalaVal(l)))
      case LessThanOrEqual(Lit(l), a: Attribute) if l.value != null =>
        Some(ColGe(colOf(a), scalaVal(l)))
      case In(a: Attribute, vs) if vs.nonEmpty &&
          vs.forall { case Lit(l) => l.value != null; case _ => false } =>
        Some(ColIn(colOf(a), vs.map { case Lit(l) => scalaVal(l) }))
      case InSet(a: Attribute, vs) if vs.nonEmpty && !vs.contains(null) =>
        Some(ColIn(colOf(a), vs.toSeq.map(v =>
          CatalystTypeConverters.convertToScala(v, a.dataType))))
      case Or(l, r) =>
        def conjuncts(x: Expression): Option[Seq[FilePred]] = x match {
          case And(p, q) => for (a <- conjuncts(p); b <- conjuncts(q)) yield a ++ b
          case other => translate(other, physToLogical).map(Seq(_))
        }
        for (a <- conjuncts(l); b <- conjuncts(r)) yield ColOr(Seq(a, b))
      case _ => None
    }
  }
}
