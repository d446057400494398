package graft.streaming

import graft.sources.AtomicWarehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Cross-warehouse CDC REPLICATION — the whole change stack composed end to
  * end: the SOURCE table's write-time change feed
  * ([[AtomicWarehouse.changesBetween]]) becomes the change INPUT of a
  * sequence-guarded apply ([[ApplyChangesStream.applyChanges]]) on a
  * DESTINATION table, possibly in a different warehouse. Each [[refresh]]
  * pulls the window since the replication cursor and applies it as ONE
  * merge:
  *
  *   - feed `insert` / `update_postimage` rows → upserts (`"u"`),
  *   - feed `delete` rows → deletes (`"d"`, retained as tombstones),
  *   - feed `update_preimage` rows → dropped (the post-image carries the
  *     state),
  *   - the change sequence is the source COMMIT VERSION — monotone per key
  *     by the manifest's own ordering, so replays and overlapping windows
  *     converge by the `s._seq >= t._seq` guard instead of corrupting.
  *
  * The replication cursor persists in the destination warehouse IN THE
  * SAME commit as the applied merge (`alsoInTx`), so a crash between apply
  * and cursor update cannot double-apply (and even a replay would converge
  * — the guard makes the ledger a fast path, not the safety argument).
  * Pure appends on the source need no feed slices (their rows read back as
  * inserts), so replication of an append-only table costs no write
  * amplification at the source; row-preserving maintenance (compaction,
  * recluster) is invisible to the replica. Windows the feed cannot
  * reconstruct — a replace, or DML from before the source's `changefeed`
  * property was on — surface as the feed's own refusals: reseed the
  * replica from a source snapshot instead of silently diverging.
  *
  * At 100 TB the refresh moves only the window's CHANGE rows across; the
  * merge's key pruning confines the replica rewrite to the band files the
  * window touches — replication cost tracks traffic, never table size.
  */
class Replicator(srcWh: AtomicWarehouse, srcTable: String,
    baseSchema: StructType, keyCols: Seq[String],
    dstWh: AtomicWarehouse, dstTable: String) {

  private val acs = new ApplyChangesStream(dstWh, dstTable, keyCols, baseSchema)

  val cursorTable = s"$dstTable/_repl/Cursor"
  val cursorSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false)))

  /** The source-log version the replica reflects (0 = never refreshed). */
  def cursor(): Int =
    if (!dstWh.exists(cursorTable)) 0
    else dstWh.read(cursorTable, cursorSchema)
      .agg(org.apache.spark.sql.functions.max(col("version"))).head() match {
      case r if r.isNullAt(0) => 0
      case r => r.getLong(0).toInt
    }

  /** The replica's live rows (tombstones filtered), base columns. */
  def state(): DataFrame = acs.currentState()

  /** Bootstrap the replica from a CONSISTENT SOURCE SNAPSHOT — the exit
    * ramp the feed refusals point at: when the window since genesis is not
    * reconstructible (the source's `changefeed` property came on late, a
    * replace broke the chain, or old manifests were vacuumed), copy the
    * source's as-of state instead and follow the feed from there.
    *
    * The snapshot rows land with applied-change metadata `_seq = version`
    * (not the null-bootstrap form), so every later change — whose sequence
    * is its commit version, strictly greater — beats them under the
    * standard guard; the replication cursor commits to `version` in the
    * SAME transaction as the data, so a crash cannot leave rows without a
    * cursor (a re-seed would then double the table, which is why a
    * non-empty replica refuses up front). A 100 TB seed is a one-time full
    * copy by design; recluster/compact the replica afterwards if the
    * source's band layout should carry over.
    */
  def seed(version: Int = srcWh.versions().lastOption.getOrElse(0)): Int = {
    require(!dstWh.exists(dstTable),
      s"seed onto non-empty replica $dstTable — a partial double-apply " +
        "cannot converge; delete the replica table first")
    val Seq(seqName, delName) = acs.storedSchema.fieldNames.takeRight(2).toSeq
    val snap = srcWh.readAt(srcTable, baseSchema, version)
      .withColumn(seqName, lit(version.toLong))
      .withColumn(delName, lit(false))
    dstWh.atomically { w =>
      w.append(dstTable, snap)
      w.replace(cursorTable, dstWh.spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(version.toLong)),
        cursorSchema))
    }
    version
  }

  /** Pull and apply everything the source committed since the cursor.
    * Returns the new cursor (unchanged when the window held no change).
    */
  def refresh(): Int = {
    val head = srcWh.versions().lastOption.getOrElse(0)
    val cur = cursor()
    if (head <= cur) return cur
    val feed = srcWh.changesBetween(srcTable, baseSchema, cur, head)
    val changes = feed
      .filter(col(srcWh.changeTypeCol) =!= lit("update_preimage"))
      .select(baseSchema.fieldNames.toSeq.map(col) ++ Seq(
        when(col(srcWh.changeTypeCol) === lit("delete"), lit("d"))
          .otherwise(lit("u")).as("_op"),
        col("_commit_version").cast(LongType).as("_seq")): _*)
    if (changes.isEmpty) return cur
    acs.applyChanges(changes, alsoInTx = w => {
      w.replace(cursorTable, dstWh.spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(head.toLong)), cursorSchema))
    })
    head
  }
}
