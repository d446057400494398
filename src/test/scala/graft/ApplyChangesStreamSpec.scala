package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.sources.AtomicWarehouse
import graft.streaming.ApplyChangesStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming CDC apply: ordered micro-batches of keyed upsert/delete changes
  * fold into a warehouse table through one mergeInto per batch, with the
  * ingest-ledger row in the same commit (replay no-ops). Contract under
  * test: stream ≡ the sequential batch folds; within-batch changes collapse
  * to the highest sequence; deleting an absent key is a no-op; a checkpoint
  * replay changes nothing.
  */
class ApplyChangesStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def changes(rows: (Long, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("id", "v", "_op", "_seq")

  private def state(wh: AtomicWarehouse, t: String): Map[Long, String] =
    wh.read(t, base).collect().map(r => (r.getLong(0), r.getString(1))).toMap

  test("batch applyChanges: upsert/delete clauses, last-seq-wins collapse, absent-delete no-op") {
    val wh = new AtomicWarehouse(spark, Files.createTempDirectory("graft-cdc-").toString)
    val acs = new ApplyChangesStream(wh, "t", Seq("id"), base)
    // genesis inserts
    val r1 = acs.applyChanges(changes((1L, "a", "u", 1L), (2L, "b", "u", 2L), (3L, "c", "u", 3L)))
    assert(r1.inserted == 3L && r1.updated == 0L)
    // one batch: key 1 updated then DELETED (seq order), key 2 updated,
    // key 9 deleted while absent (no-op), key 4 inserted
    val r2 = acs.applyChanges(changes(
      (1L, "a2", "u", 10L), (1L, "gone", "d", 11L),
      (2L, "b2", "u", 12L), (9L, "x", "d", 13L), (4L, "d4", "u", 14L)))
    assert(r2.updated == 1L && r2.deleted == 1L && r2.inserted == 1L, s"got $r2")
    assert(state(wh, "t") == Map(2L -> "b2", 3L -> "c", 4L -> "d4"))
    // resurrecting a deleted key works (insert path)
    val r3 = acs.applyChanges(changes((1L, "back", "u", 20L)))
    assert(r3.inserted == 1L)
    assert(state(wh, "t")(1L) == "back")
  }

  test("stream ≡ sequential folds, ledgered replay no-ops, untouched bands stay untouched") {
    val whDir = Files.createTempDirectory("graft-cdcs-wh-").toString
    val inDir = Files.createTempDirectory("graft-cdcs-in-").toString
    val ckpt = Files.createTempDirectory("graft-cdcs-ck-").toString
    val s = GraftSession.streamSession(spark)
    val wh = new AtomicWarehouse(s, whDir)
    val acs = new ApplyChangesStream(wh, "t", Seq("id"), base)
    val batches = Seq(
      changes((1L, "a", "u", 1L), (2L, "b", "u", 2L), (50L, "z", "u", 3L)),
      changes((1L, "a2", "u", 10L), (2L, "del", "d", 11L)),
      changes((3L, "c", "u", 20L), (50L, "z2", "u", 21L)))
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = Files.createTempDirectory(s"graft-cdcs-c$i-").toString + "/out"
      df.coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp))
        .filter(_.toString.endsWith(".parquet")).findFirst.get
      Files.move(part, Paths.get(inDir, f"chunk_$i%02d.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val sq = acs.start(inDir, ckpt)
    assert(sq.awaitTermination(GraftSession.streamDrainTimeoutMs), "stream failed to drain")
    // expected: sequential fold of the three batches
    val whRef = new AtomicWarehouse(spark,
      Files.createTempDirectory("graft-cdcs-ref-").toString)
    val ref = new ApplyChangesStream(whRef, "t", Seq("id"), base)
    batches.foreach(ref.applyChanges(_))
    assert(state(wh, "t") == state(whRef, "t"))
    assert(state(wh, "t") == Map(1L -> "a2", 3L -> "c", 50L -> "z2"))
    // replay: a fresh stream over the same input + checkpoint applies nothing
    val head = wh.versions().last
    val sq2 = acs.start(inDir, ckpt)
    assert(sq2.awaitTermination(GraftSession.streamDrainTimeoutMs))
    assert(wh.versions().last == head, "checkpoint replay must commit nothing")
    assert(state(wh, "t") == state(whRef, "t"))
  }

  test("pure-absent-delete batch still ledgers (replay protection) without changing rows") {
    val wh = new AtomicWarehouse(spark, Files.createTempDirectory("graft-cdc3-").toString)
    val acs = new ApplyChangesStream(wh, "t", Seq("id"), base)
    acs.applyChanges(changes((1L, "a", "u", 1L)))
    acs.processBatch(changes((99L, "x", "d", 2L)), batchId = 7L)
    assert(acs.ingested(7L), "the ledger row must ride the merge commit")
    assert(state(wh, "t") == Map(1L -> "a"))
    // and a replay of that batch id no-ops
    val head = wh.versions().last
    acs.processBatch(changes((1L, "CORRUPT", "u", 3L)), batchId = 7L)
    assert(wh.versions().last == head && state(wh, "t") == Map(1L -> "a"))
  }
}
