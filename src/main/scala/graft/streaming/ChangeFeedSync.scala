package graft.streaming

import graft.sources.AtomicWarehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, max}
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

  /** Apply everything the corpus committed since the cursor. Returns the
    * new cursor (unchanged when the window held no corpus change).
    */
  def sync(): Int = {
    val head = srcWh.versions().lastOption.getOrElse(0)
    val cur = cursor()
    if (head <= cur) return cur
    val feed = srcWh.changesBetween(corpusTable, corpusSchema, cur, head)
    val versions = feed.select(col("_commit_version").cast(LongType))
      .distinct().collect().map(_.getLong(0)).sorted // bounded: commits in the window
    if (versions.isEmpty) return cur
    versions.foreach { v =>
      val slice = feed.filter(col("_commit_version") === v)
      val ct = col(srcWh.changeTypeCol)
      val out = slice.filter(ct.isin("delete", "update_preimage"))
        .select(col(idCol).cast(LongType)).distinct()
        .collect().map(_.getLong(0)).toSeq // bounded: one commit's churn
      if (out.nonEmpty) retract(out, v)
      val in = slice.filter(ct.isin("insert", "update_postimage"))
        .select(corpusSchema.fieldNames.toSeq.map(col): _*)
      if (!in.isEmpty) admit(in, v)
    }
    cursorWh.replace(cursorTable, srcWh.spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(head.toLong)), cursorSchema))
    head
  }
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
}
