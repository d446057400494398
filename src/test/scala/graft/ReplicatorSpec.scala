package graft

import java.nio.file.Files

import graft.sources.{AtomicWarehouse, ColEq, ColGe, ColIn, ColLt}
import graft.streaming.Replicator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Cross-warehouse CDC replication: the source's write-time change feed
  * applied to a destination table through the sequence-guarded merge.
  * Contract under test: the replica converges to the source's live state
  * across appends + every DML flavor, refreshes are idempotent, source
  * maintenance is invisible, and un-reconstructible windows refuse
  * (reseed, never silently diverge).
  */
class ReplicatorSpec extends SparkSpec {
  import spark.implicits._

  private val kv = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def fresh(): (AtomicWarehouse, AtomicWarehouse, Replicator) = {
    val src = new AtomicWarehouse(spark, Files.createTempDirectory("graft-repl-src-").toString)
    val dst = new AtomicWarehouse(spark, Files.createTempDirectory("graft-repl-dst-").toString)
    src.setChangeFeed("t", on = true)
    (src, dst, new Replicator(src, "t", kv, Seq("id"), dst, "t"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("replica converges to the source across appends and every DML flavor") {
    val (src, _, repl) = fresh()
    src.append("t", (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    // first refresh seeds the replica from version 0
    repl.refresh()
    assert(rows(repl.state()) == rows(src.read("t", kv)))
    // a window with update + copy-on-write delete + DV delete + merge
    src.updateWhere("t", kv, Seq(ColLt("id", 5L)),
      Seq("v" -> concat(lit("U"), col("v"))))
    src.deleteWhere("t", kv, Seq(ColGe("id", 15L)))
    src.deleteWhereDv("t", kv, Seq(ColIn("id", Seq(7L, 11L))))
    src.mergeInto("t", kv, Seq((3L, "m3"), (50L, "m50")).toDF("id", "v"), Seq("id"))
    val cur = repl.refresh()
    assert(rows(repl.state()) == rows(src.read("t", kv)))
    assert(rows(repl.state()).contains((3L, "m3")) &&
      rows(repl.state()).contains((50L, "m50")) &&
      !rows(repl.state()).exists(_._1 == 7L))
    // idempotent: an immediate re-refresh moves nothing
    assert(repl.refresh() == cur)
    assert(rows(repl.state()) == rows(src.read("t", kv)))
  }

  test("source maintenance is invisible to the replica; replace windows refuse (reseed contract)") {
    val (src, _, repl) = fresh()
    src.append("t", (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    src.append("t", (10L until 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    repl.refresh()
    src.deleteWhereDv("t", kv, Seq(ColIn("id", Seq(2L))))
    src.compactDv("t", kv, minDeadFraction = 0.01) // folds — row-preserving
    src.compactSmall("t", kv, minBytes = 1L << 20) // bin-pack — row-preserving
    repl.refresh()
    assert(rows(repl.state()) == rows(src.read("t", kv)))
    // a replace breaks the feed: the replicator surfaces the refusal
    src.replace("t", Seq((99L, "z")).toDF("id", "v"))
    val e = intercept[IllegalStateException](repl.refresh())
    assert(e.getMessage.contains("not a row-level change"))
    // the replica still holds the last replicated state (no silent divergence)
    assert(rows(repl.state()) == (0L until 20L).filterNot(_ == 2L)
      .map(i => (i, s"v$i")).toSet)
  }

  test("seed() bootstraps from a snapshot where the feed cannot reconstruct") {
    // the source lived BEFORE its change feed: appends + DML with CDF off
    val src = new AtomicWarehouse(spark, Files.createTempDirectory("graft-repl-src-").toString)
    val dst = new AtomicWarehouse(spark, Files.createTempDirectory("graft-repl-dst-").toString)
    src.append("t", (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    src.updateWhere("t", kv, Seq(ColLt("id", 3L)),
      Seq("v" -> concat(lit("U"), col("v")))) // pre-feed DML: unrecorded
    src.setChangeFeed("t", on = true)
    val repl = new Replicator(src, "t", kv, Seq("id"), dst, "t")
    // from-genesis replication refuses (the window is unreconstructible)
    val e = intercept[IllegalStateException](repl.refresh())
    assert(e.getMessage.contains("change feed was not enabled"))
    // seed from the head snapshot, then the feed takes over
    val at = repl.seed()
    assert(repl.cursor() == at)
    assert(rows(repl.state()) == rows(src.read("t", kv)))
    // post-seed traffic flows through the normal guarded apply
    src.deleteWhereDv("t", kv, Seq(ColIn("id", Seq(4L))))
    src.mergeInto("t", kv, Seq((1L, "m1"), (77L, "m77")).toDF("id", "v"), Seq("id"))
    repl.refresh()
    assert(rows(repl.state()) == rows(src.read("t", kv)))
    // a cursor wound back INTO the seeded window replays over the seed
    // rows and converges (their _seq loses to every later change)
    dst.replace(repl.cursorTable, Seq(at.toLong).toDF("version"))
    repl.refresh()
    assert(rows(repl.state()) == rows(src.read("t", kv)))
    // re-seeding a live replica refuses — double-apply cannot converge
    intercept[IllegalArgumentException](repl.seed())
  }

  test("a delete-then-late-window overlap converges by the sequence guard") {
    val (src, dst, repl) = fresh()
    src.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    repl.refresh()
    src.deleteWhere("t", kv, Seq(ColEq("id", 1L)))
    repl.refresh()
    assert(rows(repl.state()) == Set((2L, "b")))
    // wind the cursor BACK (a restored-from-backup replica): re-applying
    // the whole history over the newer state must converge, not resurrect
    dst.replace(repl.cursorTable,
      Seq(0L).toDF("version"))
    repl.refresh()
    assert(rows(repl.state()) == Set((2L, "b")), "replayed history must converge")
  }
}
