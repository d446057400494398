package graft.operators

import java.sql.Timestamp

import graft.model.Schemas
import graft.model.Schemas.FileStatus
import graft.sources.Warehouse
import org.apache.spark.sql.functions._

/** File-level idempotency ledger — the engine's ProcessFile table
  * (S8/S10: core/etl_orchestrator.py:46-58 status lookup, :285-344 lifecycle
  * 2 → 3/4). The ledger is intentionally a *queryable table*, not just a
  * checkpoint, mirroring the reference where operators can inspect status.
  *
  * The table is file-count-sized (one row per ingested file), so point
  * lookups are a filter + limit over a small parquet — and the status flip is
  * a read-modify-replace of that small table. On a production deployment the
  * same API maps onto a Delta MERGE.
  *
  * SINGLE-WRITER contract: `markInProgress` mints ids by scanning max(Id)
  * and `setStatus` rewrites the table, so two concurrent pipelines (or a
  * second StreamRunner on the same warehouse) could mint duplicate ids or
  * lose a status flip. The reference delegates this to the database's
  * transactionality; here it holds because the driver runs one pipeline and
  * foreachBatch is sequential. Multi-writer deployments key attempts by
  * (container, fileName, batchGuid) on a transactional sink instead.
  */
class Ledger(wh: Warehouse) {
  private val table = "ledger/ProcessFile"

  def all(): org.apache.spark.sql.DataFrame = wh.read(table, Schemas.processFile)

  /** S8/P7 — point status lookup; 1 (not seen) when absent. */
  def statusOf(container: String, fileName: String): Int = {
    val rows = all()
      .filter(col("Container") === container && col("FileName") === fileName)
      .select(col("StatusId"), col("Id"))
      .orderBy(col("Id").desc)
      .limit(1)
      .collect()
    if (rows.isEmpty) FileStatus.NotSeen else rows.head.getInt(0)
  }

  /** S10 — insert an in-progress row (status 2), returning its id. */
  def markInProgress(container: String, fileName: String, blobSize: Option[Long] = None,
      contentType: Option[String] = None): Int = {
    val df = all()
    val r = df.agg(max(col("Id"))).head()
    val nextId = (if (r.isNullAt(0)) 0 else r.getInt(0)) + 1
    import wh.spark.implicits._
    val row = Seq(Schemas.ProcessFileRow(nextId, container, fileName, FileStatus.InProgress,
      new Timestamp(System.currentTimeMillis()), blobSize, contentType, None)).toDF()
    wh.append(table, row.select(Schemas.processFile.fieldNames.map(col).toIndexedSeq: _*))
    nextId
  }

  /** S10 — flip status (2 → 3 success / 4 failed) on ONE attempt row (the id
    * returned by markInProgress), preserving the history of earlier attempts
    * exactly as the reference updates only the current ProcessFile row.
    */
  def setStatus(rowId: Int, statusId: Int): Unit = {
    val updated = all().withColumn("StatusId",
      when(col("Id") === rowId, lit(statusId)).otherwise(col("StatusId")))
    wh.replace(table, updated)
  }
}
