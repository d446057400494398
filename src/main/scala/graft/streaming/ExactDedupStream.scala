package graft.streaming

import graft.operators.Dedup
import graft.sources.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming incremental EXACT dedup — the most common continuous-ingest
  * dedup: each micro-batch is probed against the persisted content-hash
  * index ([[Dedup.incrementalExactNew]]); only novel-content rows are
  * admitted, and their hashes join the index. Per-batch cost tracks the
  * batch (bounded hash point-probe into a sha-sorted index — same measured
  * mechanism as the LSH band probe), never the accumulated corpus.
  *
  * Semantics are FIRST-ARRIVAL-WINS, which is what a stream can promise:
  * the survivor for a duplicated text is the min-id row of the EARLIEST
  * micro-batch containing that text — unlike batch [[Dedup.exactDedup]]'s
  * global min-id, a later-arriving smaller id loses to an already-admitted
  * copy. For deterministic batching (the `dedup_exact_stream` driver query
  * splits by `doc_id % 3`) that is exactly
  * `row_number() OVER (PARTITION BY hash ORDER BY batch, id) = 1`, which is
  * what the DuckDB oracle states. ExactDedupStreamSpec proves the invariant
  * directly per batch.
  *
  * The admit (survivors + their hashes) is one `atomically` section: on an
  * [[graft.sources.AtomicWarehouse]] a crash can never leave a document
  * admitted without its hash (which would let a later copy in) or a hash
  * without its document (which would silently drop content); on the base
  * warehouse, checkpoint replay of a partial batch re-admits — hash-index
  * rows may duplicate but the SURVIVOR SET is unchanged (the probe rejects
  * what the index already has, whichever write survived).
  */
class ExactDedupStream(wh: Warehouse, probeHashLimit: Int = 1000,
    compactEvery: Int = 0) {

  val indexTable = "dedup/ExactHashIndex"
  val corpusTable = "dedup/ExactSurvivors"

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))
  val idxSchema: StructType = StructType(Seq(
    StructField("text_sha", StringType, nullable = false)))

  /** Probe one micro-batch against the index and admit the novel rows. */
  def processBatch(batch0: DataFrame): Unit = {
    val batch = batch0.select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
    // persisted because it is written twice below AND its plan reads the
    // index table the second write appends to — materializing once keeps
    // the read's file set fixed (same pattern as DedupStream's batchSigs)
    val admitted = Dedup.incrementalExactNew(
      batch, wh.read(indexTable, idxSchema), "doc_id", "text", probeHashLimit)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try wh.atomically { w =>
      w.append(corpusTable, admitted)
      // sha-sorted within files: the point-probe's row-group pruning rides
      // on tight min/max stats for this column
      w.append(indexTable, admitted
        .select(coalesce(sha2(col("text"), 256), lit("__null_text__")).as("text_sha"))
        .sortWithinPartitions("text_sha"))
    } finally admitted.unpersist(false)
    batchesSinceCompact += 1
    if (compactEvery > 0 && batchesSinceCompact >= compactEvery) {
      compactAll()
      batchesSinceCompact = 0
    }
  }

  private var batchesSinceCompact = 0

  /** Small-file maintenance; the index re-sorts by hash on rewrite (see
    * [[DedupStream.compactAll]] on why concatenating rewrites would ruin
    * the probe's row-group stats).
    */
  def compactAll(targetFiles: Int = 1): Unit = {
    wh.compact(indexTable, idxSchema, targetFiles, sortCols = Seq("text_sha"))
    wh.compact(corpusTable, docSchema, targetFiles)
    // transactional warehouse: also fold the manifest log + collect
    // superseded files (see DedupStream.compactAll)
    wh match {
      case aw: graft.sources.AtomicWarehouse => aw.vacuum()
      case _ => ()
    }
  }

  /** Every admitted (first-arrival-unique) document so far. */
  def survivors(): DataFrame = wh.read(corpusTable, docSchema)

  /** Watch `dir` for parquet document files (doc_id, text); see
    * [[DedupStream.start]] for trigger/batch-size tradeoffs.
    */
  def start(dir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    wh.spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) => processBatch(batch) }
      .start()
}
