package graft.streaming

import graft.operators.PersistedPostings
import graft.sources.AtomicWarehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** The inverted index as an INCREMENTALLY-MAINTAINED MATERIALIZED VIEW of a
  * lakehouse corpus table — the retraction IVM idea (`IncrementalAgg` over
  * the change feed) applied to a non-aggregate derived structure, riding
  * the generic [[ChangeFeedSync]] loop:
  *
  *   - `delete` / `update_preimage` rows → [[PersistedPostings.retractDocsLedgered]]
  *     (merge-on-read tombstones + the negative stats row + the retraction
  *     ledger row, one commit),
  *   - `insert` / `update_postimage` rows → [[PersistedPostings.addDocsLedgered]]
  *     (tokenize ONLY the slice, append postings + stats row, one commit),
  *
  * so an UPDATE is retraction-then-admission of the same id and the index
  * after any DML mix is bit-identical to a from-scratch build over the live
  * corpus ([[PersistedPostings.retractDocs]]'s equivalence argument, now
  * maintained continuously). Exactly-once, refusals, cursor fixpoint, and
  * the churn-not-size cost argument are [[ChangeFeedSync]]'s contract.
  *
  * Caller contract: the index must reflect the corpus as of the cursor
  * (seed via [[PersistedPostings.build]] on the corpus state at
  * feed-enable time, or start both empty), and this driver is the index's
  * ONLY maintainer (the ledger id space is corpus commit versions; mixing
  * in a stream's micro-batch ids would collide).
  */
class FtsSync(srcWh: AtomicWarehouse, corpusTable: String,
    corpusSchema: StructType, idCol: String, textCol: String,
    fts: PersistedPostings)
    extends ChangeFeedSync(srcWh, corpusTable, corpusSchema, idCol) {

  val cursorTable = s"${fts.postingsTable}/_sync/Cursor"
  protected def cursorWh: graft.sources.Warehouse = fts.wh

  protected def retract(ids: Seq[Long], version: Long): Unit =
    fts.retractDocsLedgered(ids, version)

  protected def admit(rows: DataFrame, version: Long): Unit =
    fts.addDocsLedgered(rows, idCol, textCol, version)

  override protected def applyCommit(outIds: Seq[Long], in: Option[DataFrame],
      version: Long): Unit =
    fts.applyChangeLedgered(outIds, in, idCol, textCol, version)
}
