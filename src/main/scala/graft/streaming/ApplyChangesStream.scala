package graft.streaming

import graft.sources.AtomicWarehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, lit, row_number}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming CDC APPLY — the Debezium-shaped "apply changes into a table"
  * loop, built on [[AtomicWarehouse.mergeInto]]: change rows (the target's
  * columns plus an op column, `"u"` upsert / `"d"` delete, and a per-key
  * sequence column) arrive as parquet files; each micro-batch collapses to
  * its LAST change per key and applies as ONE merge — matched `u` updates,
  * matched `d` deletes, unmatched `u` inserts, unmatched `d` is a no-op
  * (deleting what isn't there), exactly the semantics a downstream of a
  * database's change feed needs. The merge's source-bounds file pruning
  * confines each batch's rewrite to the band files its keys touch, so a
  * day's changes against a 100 TB table rewrite the touched files, not the
  * table.
  *
  * ==Exactly once==
  * The merge rewrite and a `(batch_id)` ingest-ledger row publish in the
  * SAME manifest commit (`mergeInto(alsoInTx = ledger append)`): a
  * checkpoint replay of a committed micro-batch sees its id and no-ops.
  * Unlike SCD2 there is no semantic safety net — re-applying "delete key k,
  * then earlier insert k" out of order corrupts — so the ledger carries the
  * whole contract, and [[start]] pins `maxFilesPerTrigger = 1` for in-order
  * file delivery (the same ordering contract as [[ScdStream]]).
  *
  * ==Within-batch collapse==
  * A batch may carry several changes for one key (insert then update then
  * delete); only the one with the highest `seqCol` value applies — the
  * merge's cardinality rule would otherwise refuse the batch. Sequence
  * ties on one key are a feed bug; the collapse picks one arbitrarily.
  */
class ApplyChangesStream(wh: AtomicWarehouse, table: String,
    keyCols: Seq[String], baseSchema: StructType,
    opCol: String = "_op", seqCol: String = "_seq") {

  /** The change-feed schema the stream reads: target columns + op + seq. */
  val changeSchema: StructType = StructType(baseSchema.fields.toSeq ++ Seq(
    StructField(opCol, StringType, nullable = false),
    StructField(seqCol, LongType, nullable = false)))

  val ledgerTable = s"$table/_cdc/IngestLedger"
  val ledgerSchema: StructType = StructType(Seq(
    StructField("batch_id", LongType, nullable = false)))

  def ingested(batchId: Long): Boolean =
    wh.exists(ledgerTable) && !wh.read(ledgerTable, ledgerSchema)
      .filter(col("batch_id") === batchId).isEmpty

  private def ledgerRow(batchId: Long): DataFrame =
    wh.spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(Long.box(batchId))),
      ledgerSchema)

  /** Apply one batch of changes (batch surface, stream-independent):
    * collapse to last-change-per-key, then one [[AtomicWarehouse.mergeInto]]
    * with the CDC clause wiring. Returns the merge result.
    */
  def applyChanges(changes: DataFrame,
      alsoInTx: graft.sources.Warehouse => Unit = _ => ())
      : graft.sources.MergeIntoResult = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val lastPerKey = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    wh.mergeInto(table, baseSchema, lastPerKey, keyCols,
      whenMatchedDelete = Some(col(s"s.$opCol") === lit("d")),
      insertWhen = Some(col(s"s.$opCol") =!= lit("d")),
      alsoInTx = alsoInTx)
  }

  private[graft] def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (ingested(batchId)) return
    if (batch.isEmpty) {
      // file-source bookkeeping batch: ledger it, touch nothing
      wh.atomically(_.append(ledgerTable, ledgerRow(batchId)))
      return
    }
    // a batch of pure unmatched-deletes still publishes a merge commit (the
    // rewrite is empty but staged) — the ledger row rides it; only a fully
    // EMPTY source skips the commit, which the isEmpty branch above handles
    applyChanges(batch, alsoInTx = _.append(ledgerTable, ledgerRow(batchId)))
  }

  /** Watch `dir` for parquet change files; one file per micro-batch IN
    * ORDER (class doc). The target table needs no prior build — the first
    * batch's inserts are genesis.
    */
  def start(dir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    wh.spark.readStream
      .schema(changeSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) => processBatch(batch, batchId) }
      .start()
}
