package graft.streaming

import graft.operators.PersistedPostings
import graft.sources.AtomicWarehouse
import org.apache.spark.sql.functions.{col, max}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The inverted index as an INCREMENTALLY-MAINTAINED MATERIALIZED VIEW of a
  * lakehouse corpus table — the retraction IVM idea (`IncrementalAgg` over
  * the change feed) applied to a non-aggregate derived structure. Each
  * [[sync]] pulls the corpus table's change feed since the maintenance
  * cursor and applies it COMMIT BY COMMIT:
  *
  *   - `delete` / `update_preimage` rows → [[PersistedPostings.retractDocsLedgered]]
  *     (merge-on-read tombstones + the negative stats row, one commit),
  *   - `insert` / `update_postimage` rows → [[PersistedPostings.addDocsLedgered]]
  *     (tokenize ONLY the slice, append postings + stats row, one commit),
  *
  * so an UPDATE is retraction-then-admission of the same id and the index
  * after any DML mix is bit-identical to a from-scratch build over the live
  * corpus ([[PersistedPostings.retractDocs]]'s equivalence argument, now
  * maintained continuously). Exactly-once rides the per-commit LEDGERS, not
  * the cursor: the batch id is the corpus COMMIT VERSION (stable across
  * replays — a window id would change when a crash widens the next window),
  * retracts and admits each record their version in the same commit as
  * their effect, and the cursor is advanced last as a fast path. A crash
  * anywhere replays the window; every already-applied commit no-ops.
  *
  * Windows the feed cannot reconstruct (replace/truncate, pre-enablement
  * DML) surface as `changesBetween`'s refusal — rebuild the index from a
  * corpus snapshot; row-preserving maintenance on the corpus (compaction,
  * recluster) is feed-invisible and moves nothing here. At 100 TB each sync
  * tokenizes only the window's changed documents — maintenance cost tracks
  * corpus CHURN, never corpus size.
  *
  * Contract: the index must reflect the corpus as of the cursor (seed via
  * [[PersistedPostings.build]] on the corpus state at feed-enable time, or
  * start both empty), and this driver is the index's ONLY maintainer (the
  * ledger id space is corpus commit versions; mixing in a stream's
  * micro-batch ids would collide).
  */
class FtsSync(srcWh: AtomicWarehouse, corpusTable: String,
    corpusSchema: StructType, idCol: String, textCol: String,
    fts: PersistedPostings) {

  val cursorTable = s"${fts.postingsTable}/_sync/Cursor"
  private val cursorSchema = StructType(Seq(
    StructField("version", LongType, nullable = false)))

  /** The corpus-log version the index reflects (0 = never synced). */
  def cursor(): Int =
    if (!ftsWh.exists(cursorTable)) 0
    else ftsWh.read(cursorTable, cursorSchema)
      .agg(max(col("version"))).head() match {
        case r if r.isNullAt(0) => 0
        case r => r.getLong(0).toInt
      }

  private def ftsWh = fts.wh

  /** Apply everything the corpus committed since the cursor. Returns the
    * new cursor (unchanged when the window held no change).
    */
  def sync(): Int = {
    val head = srcWh.versions().lastOption.getOrElse(0)
    val cur = cursor()
    if (head <= cur) return cur
    val feed = srcWh.changesBetween(corpusTable, corpusSchema, cur, head)
    val versions = feed.select(col("_commit_version").cast(LongType))
      .distinct().collect().map(_.getLong(0)).sorted // bounded: commits in the window
    // a window with no corpus change (other tables' commits — including our
    // own cursor writes when index and corpus share a warehouse, and the
    // corpus's cdfnoop maintenance) moves nothing and does NOT advance the
    // cursor: writing it would itself commit, so a no-op sync would mint
    // versions forever instead of reaching a fixpoint
    if (versions.isEmpty) return cur
    versions.foreach { v =>
      val slice = feed.filter(col("_commit_version") === v)
      val ct = col(srcWh.changeTypeCol)
      val out = slice.filter(ct.isin("delete", "update_preimage"))
        .select(col(idCol).cast(LongType)).distinct()
        .collect().map(_.getLong(0)).toSeq // bounded: one commit's churn
      if (out.nonEmpty) fts.retractDocsLedgered(out, v)
      val in = slice.filter(ct.isin("insert", "update_postimage"))
        .select(col(idCol), col(textCol))
      if (!in.isEmpty) fts.addDocsLedgered(in, idCol, textCol, v)
    }
    ftsWh.replace(cursorTable, srcWh.spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(head.toLong)), cursorSchema))
    head
  }
}
