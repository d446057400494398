package graft.streaming

import graft.operators.Dedup
import graft.sources.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}

/** Streaming incremental near-dup detection: each micro-batch of documents is
  * deduped against the corpus-so-far through the persisted signature index
  * ([[Dedup.incrementalLshVerifiedPairs]]), then the batch's documents and
  * signatures are admitted to the corpus. Per-batch cost scales with the
  * batch and its bucket collisions, never with accumulated corpus size — the
  * shape that keeps continuous-ingest dedup sustainable at 100 TB.
  *
  * Invariant (proved by DedupStreamSpec and the `dedup_stream` driver
  * oracle): every pair (a, b) is emitted exactly once — in the micro-batch
  * that contains its LATER document — so after draining, the accumulated
  * pairs table equals a from-scratch [[Dedup.lshVerifiedPairs]] run over the
  * full corpus, regardless of how ingestion was batched.
  *
  * Signatures are computed ONCE per batch and serve both the join and the
  * index append. Idempotency: the Spark checkpoint gives at-most-once file
  * discovery, and the three appends per batch are not transactional — a
  * crash mid-batch can leave a partial batch (same single-writer,
  * non-transactional contract as [[graft.operators.Ledger]]; a production
  * deployment gets batch atomicity from a transactional table format).
  */
class DedupStream(wh: Warehouse, k: Int = 5, numHashes: Int = 8,
    rowsPerBand: Int = 2, minJaccard: Double = 0.5, minSigMatchesOverride: Int = -1) {

  val indexTable = "dedup/SignatureIndex"
  val bandTable = "dedup/BandIndex"
  val corpusTable = "dedup/Corpus"
  val pairsTable = "dedup/NearDupPairs"

  private val sigSchema = StructType(StructField("doc_id", LongType, nullable = false) +:
    (0 until numHashes).map(i => StructField(s"mh$i", LongType, nullable = true)))
  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("band", IntegerType, nullable = false),
    StructField("key", StringType, nullable = true)))
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))
  private val pairSchema = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("jaccard", DoubleType, nullable = true)))

  /** Dedup one micro-batch against the corpus-so-far, append the discovered
    * pairs, and admit the batch (docs + signatures).
    */
  def processBatch(batch0: DataFrame): Unit = {
    val batch = batch0
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batchSigs = Dedup.minhashSignatures(batch, "doc_id", "text", k, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batchBands = Dedup.bandKeys(batchSigs, "doc_id", numHashes, rowsPerBand)
    // persistCorpusSigs=false: the index is already a parquet table — its
    // consumers re-scan it narrowly instead of materializing the whole
    // accumulated index into executor memory every batch. The corpus side
    // of the band join reads the PERSISTED band table (stored join column,
    // key-sorted files): row-group stats + runtime bloom filters prune the
    // probe toward the matched buckets, so per-batch cost tracks the batch,
    // not the accumulated corpus.
    val pairs = Dedup.incrementalLshVerifiedPairs(
      wh.read(corpusTable, docSchema), wh.read(indexTable, sigSchema), batch,
      "doc_id", "text", k, numHashes, rowsPerBand, minJaccard,
      minSigMatchesOverride, freshSigsPre = Some(batchSigs),
      persistCorpusSigs = false,
      corpusBandsPre = Some(wh.read(bandTable, bandSchema)))
    // pairs FIRST and alone: its plan scans the index/band/corpus tables,
    // so the admit appends below must not land new files while it runs
    // (a probe that saw the batch's own signatures would re-emit
    // fresh×fresh pairs through the fresh×corpus path)
    wh.append(pairsTable, pairs)
    // the three admit appends are independent writes of already-persisted
    // frames (no reads) — run them concurrently to collapse three job
    // latencies into one; the per-batch harness overhead is the dominant
    // cost of small micro-batches
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(Seq(
      Future(wh.append(indexTable, batchSigs)),
      // key-sorted within files so parquet min/max stats stay tight per group
      Future(wh.append(bandTable, batchBands.sortWithinPartitions("key"))),
      Future(wh.append(corpusTable, batch)))),
      scala.concurrent.duration.Duration(10, "min"))
    batchSigs.unpersist(false)
    batch.unpersist(false)
  }

  /** All near-dup pairs discovered so far. */
  def pairs(): DataFrame = wh.read(pairsTable, pairSchema)

  /** Current corpus (every admitted document; dedup POLICY — dropping
    * losers — is a downstream choice over [[pairs]], e.g.
    * [[Dedup.nearDupDedup]]'s cluster resolution).
    */
  def corpus(): DataFrame = wh.read(corpusTable, docSchema)

  /** Watch `dir` for parquet document files (doc_id, text). AvailableNow
    * drains pending files then stops; ProcessingTime watches continuously.
    *
    * `maxFilesPerTrigger` sizes each micro-batch: the pairs-emitted
    * invariant holds for ANY batching (DedupStreamSpec proves it), so
    * production tuning is purely the per-batch harness cost (~1-2 s of
    * fixed job overhead per batch here) against dedup latency — larger
    * batches amortize the overhead, 1 file per trigger minimizes
    * time-to-detection.
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
