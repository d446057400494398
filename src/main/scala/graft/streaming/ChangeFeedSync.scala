package graft.streaming

import graft.sources.AtomicWarehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, collect_set, count, max, when}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The GENERIC maintenance loop for a derived structure riding a corpus
  * table's change feed — the shape [[FtsSync]] proved for the inverted
  * index, factored so every persisted index maintains the same way: pull
  * the window since the cursor, apply it COMMIT BY COMMIT (retraction for
  * `delete`/`update_preimage` ids, admission for `insert`/
  * `update_postimage` rows — an UPDATE is retract-then-admit of the same
  * id), and advance the cursor last. Exactly-once belongs to the
  * IMPLEMENTATIONS: `retract`/`admit` receive the corpus COMMIT VERSION as
  * their batch id (stable across replays, where a window id would shift
  * when a crash widens the next window) and must ledger it in the same
  * commit as their effect — then a wound-back cursor replays the whole
  * history and every applied commit no-ops.
  *
  * A window with no corpus commit does NOT advance the cursor: the cursor
  * write itself commits, so a no-op sync would mint versions forever when
  * index and corpus share a warehouse. Windows the feed cannot reconstruct
  * (replace/truncate, pre-enablement DML) refuse via `changesBetween` —
  * reseed the index from a corpus snapshot; row-preserving corpus
  * maintenance is feed-invisible here. Cost tracks corpus CHURN, never
  * corpus size.
  */
abstract class ChangeFeedSync(srcWh: AtomicWarehouse, corpusTable: String,
    corpusSchema: StructType, idCol: String) {

  /** Warehouse holding the maintenance cursor (usually the index's). */
  protected def cursorWh: graft.sources.Warehouse

  /** Cursor table name — one per maintained structure. */
  def cursorTable: String

  /** Un-learn `ids` (one corpus commit's deletes + update pre-images),
    * ledgered under `version` in the same commit as the effect.
    */
  protected def retract(ids: Seq[Long], version: Long): Unit

  /** Learn `rows` (one corpus commit's inserts + update post-images, in
    * corpus schema), ledgered under `version` likewise.
    */
  protected def admit(rows: DataFrame, version: Long): Unit

  /** Apply ONE corpus commit — retraction of `outIds` then admission of
    * `in` (either side may be absent). The default is the split path
    * (retract commit, then admit commit); implementations whose index
    * supports it override with a FUSED single-commit apply
    * (`applyChangeLedgered`), halving commits for update-shaped churn and
    * closing the crash window where a doc's old state is un-learned but
    * its new state not yet admitted.
    */
  protected def applyCommit(outIds: Seq[Long], in: Option[DataFrame],
      version: Long): Unit = {
    if (outIds.nonEmpty) retract(outIds, version)
    in.foreach(admit(_, version))
  }

  /** Max retraction ids per commit materialized on the driver by the
    * census. Per-commit churn is the RIGHT bound for CDC — but it is the
    * writer's bound, not ours: one adversarial commit deleting 10⁸ rows
    * would OOM the driver through a `collect_set`. Above the cap the
    * commit routes through [[applyCommitFrame]] with the retraction set
    * left distributed.
    */
  protected def censusIdCap: Int = 1000000

  /** Giant-churn apply: `applyCommit`'s contract with the retraction ids
    * as a distinct single-column (`id`, LongType) DataFrame that never
    * touched the driver. The default falls back to a driver
    * materialization (correct for every implementation, reinstating the
    * memory exposure the cap flagged); implementations with a join-shaped
    * retraction override it to stay distributed end-to-end.
    */
  protected def applyCommitFrame(out: DataFrame, in: Option[DataFrame],
      version: Long): Unit =
    applyCommit(out.collect().map(_.getLong(0)).toSeq, in, version)

  /** Apply the window's commits, version-sorted. The default replays them
    * COMMIT BY COMMIT (exactly the pre-window-fusion behavior: over-cap
    * retractions stay distributed via [[applyCommitFrame]], the rest go
    * through [[applyCommit]]). Implementations whose index supports it
    * override with a FUSED whole-window apply ([[FtsSync]] →
    * [[graft.operators.PersistedPostings.applyWindowLedgered]]): a K-commit
    * window then costs ONE index commit instead of K — per-commit fixed
    * latency (ledger probes, scalar aggregates, manifest commit fsync) was
    * the dominant cost of small-churn windows — and must fall back to this
    * default whenever the fused path cannot prove equivalence (a replayed
    * window with partially-applied versions, an over-cap commit).
    */
  protected def applyWindow(commits: Seq[ChangeFeedSync.SyncCommit]): Unit =
    commits.foreach { c =>
      if (c.nOut > censusIdCap) applyCommitFrame(c.outFrame(), c.in, c.version)
      else applyCommit(c.outIds, c.in, c.version)
    }

  private val cursorSchema = StructType(Seq(
    StructField("version", LongType, nullable = false)))

  /** The corpus-log version the structure reflects (0 = never synced). */
  def cursor(): Int =
    if (!cursorWh.exists(cursorTable)) 0
    else cursorWh.read(cursorTable, cursorSchema)
      .agg(max(col("version"))).head() match {
        case r if r.isNullAt(0) => 0
        case r => r.getLong(0).toInt
      }

  /** Last window verified to hold ZERO corpus changes, as
    * (cursor-it-was-scanned-from, head-scanned-to). An empty window cannot
    * advance the persisted cursor (the cursor write itself mints a
    * version — a no-op sync would version forever when index and corpus
    * share a warehouse), but without remembering the scan each idle
    * `sync()` re-walks an ever-growing manifest window as the INDEX's own
    * commits keep raising head. Keyed to the cursor value so an external
    * cursor wind-back (reseed/replay) invalidates the shortcut — a window
    * is only ever skipped after being verified empty FROM this cursor.
    */
  @volatile private var emptyScan: Option[(Int, Int)] = None

  /** Apply everything the corpus committed since the cursor. Returns the
    * new cursor (unchanged when the window held no corpus change).
    *
    * The window is materialized ONCE (it is churn-sized, never
    * corpus-sized) and a single census aggregate yields every per-commit
    * retraction id set and admission count — without it, each commit in
    * the window would re-read every change file three times (version
    * probe, retract-id collect, emptiness check), a per-commit fixed cost
    * that dominates small-churn windows and scales with window WIDTH
    * rather than churn.
    */
  def sync(): Int = {
    val head = srcWh.versions().lastOption.getOrElse(0)
    val cur = cursor()
    val from = emptyScan match {
      case Some((c, to)) if c == cur => math.max(cur, to)
      case _ => cur
    }
    if (head <= from) return cur
    val feed = srcWh.changesBetween(corpusTable, corpusSchema, from, head)
      .persist()
    try {
      val ct = col(srcWh.changeTypeCol)
      val retracting = ct.isin("delete", "update_preimage")
      val vCol = col("_commit_version").cast(LongType)
      // ONE driver job: per-commit churn COUNTS (no id materialization yet
      // — a single adversarial 10⁸-row delete must not OOM the driver)
      val census = feed.groupBy(vCol.as("v"))
        .agg(
          count(when(retracting, 1)).as("nOut"),
          count(when(ct.isin("insert", "update_postimage"), 1)).as("nIn"))
        .collect()
      if (census.isEmpty) { emptyScan = Some((cur, head)); return cur }
      // second job, still ONE for the whole window: id sets for the
      // commits under the cap (the common case — every set is bounded by
      // censusIdCap by construction). Over-cap commits keep their ids
      // distributed and route through applyCommitFrame.
      val smallVs = census.filter(r => r.getAs[Long]("nOut") <= censusIdCap &&
        r.getAs[Long]("nOut") > 0L).map(_.getAs[Long]("v"))
      val idSets: Map[Long, Seq[Long]] =
        if (smallVs.isEmpty) Map.empty
        else feed.filter(retracting && vCol.isin(smallVs.map(Long.box): _*))
          .groupBy(vCol.as("v"))
          .agg(collect_set(col(idCol).cast(LongType)).as("outIds"))
          .collect()
          .map(r => r.getAs[Long]("v") -> r.getSeq[Long](r.fieldIndex("outIds")))
          .toMap
      val commits = census.sortBy(_.getAs[Long]("v")).toSeq.map { r =>
        val v = r.getAs[Long]("v")
        val in =
          if (r.getAs[Long]("nIn") == 0L) None
          else Some(feed.filter(col("_commit_version") === v &&
              ct.isin("insert", "update_postimage"))
            .select(corpusSchema.fieldNames.toSeq.map(col): _*))
        ChangeFeedSync.SyncCommit(v, r.getAs[Long]("nOut"),
          idSets.getOrElse(v, Nil),
          () => feed.filter(retracting && vCol === v)
            .select(col(idCol).cast(LongType).as("id")).distinct(), in)
      }
      applyWindow(commits)
      cursorWh.replace(cursorTable, srcWh.spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(head.toLong)), cursorSchema))
      emptyScan = None
      head
    } finally feed.unpersist()
  }
}

object ChangeFeedSync {
  /** One corpus commit of a sync window: `outIds` holds the retraction id
    * set ONLY when `nOut ≤ censusIdCap` (the census never materializes an
    * over-cap commit's ids on the driver — `outFrame` is the distributed
    * form those route through), `in` the admission rows in corpus schema.
    */
  final case class SyncCommit(version: Long, nOut: Long, outIds: Seq[Long],
      outFrame: () => DataFrame, in: Option[DataFrame])
}

/** The IVF ANN index as an incrementally-maintained MV of an embeddings
  * corpus table — [[FtsSync]]'s twin: deletes/update-preimages tombstone
  * cell assignments ([[graft.operators.PersistedIvf.retractVectorsLedgered]]),
  * inserts/update-postimages assign-and-admit
  * ([[graft.operators.PersistedIvf.addVectorsLedgered]] — batch-sized,
  * against the standing centroids), both ledgered by corpus commit
  * version. Centroids keep their training history; `drifted`/`retrain`
  * remain the recalibration path when churn moves the distribution.
  */
class VectorSync(srcWh: AtomicWarehouse, corpusTable: String,
    corpusSchema: StructType, idCol: String, vecCol: String,
    ivf: graft.operators.PersistedIvf)
    extends ChangeFeedSync(srcWh, corpusTable, corpusSchema, idCol) {

  val cursorTable = s"${ivf.assignTable}/_sync/Cursor"
  protected def cursorWh: graft.sources.Warehouse = ivf.wh

  protected def retract(ids: Seq[Long], version: Long): Unit =
    ivf.retractVectorsLedgered(ids, version)

  protected def admit(rows: DataFrame, version: Long): Unit =
    ivf.addVectorsLedgered(rows, idCol, vecCol, version)

  override protected def applyCommit(outIds: Seq[Long], in: Option[DataFrame],
      version: Long): Unit =
    ivf.applyChangeLedgered(outIds, in, idCol, vecCol, version)

  /** Giant-churn retraction in cap-bounded chunks — [[FtsSync]]'s pattern
    * (chunk sub-ids + completion marker) over cell assignments.
    */
  override protected def applyCommitFrame(out: DataFrame, in: Option[DataFrame],
      version: Long): Unit = {
    if (!ivf.retracted(version)) {
      import org.apache.spark.sql.functions.col
      val it = out.orderBy(col("id")).toLocalIterator()
      val buf = scala.collection.mutable.ArrayBuffer[Long]()
      var chunk = 0
      def flush(): Unit = if (buf.nonEmpty) {
        ivf.retractVectorsLedgered(buf.toSeq, FtsSync.chunkLedgerId(version, chunk))
        chunk += 1
        buf.clear()
      }
      while (it.hasNext) {
        buf += it.next().getLong(0)
        if (buf.size >= censusIdCap) flush()
      }
      flush()
      ivf.ledgerRetraction(version)
    }
    in.foreach(admit(_, version))
  }
}
