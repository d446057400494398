package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.sources.AtomicWarehouse
import graft.sql.GraftCatalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** `spark.readStream.table` over warehouse tables (the streaming source):
  * offsets are commit versions, each micro-batch is exactly the files the
  * manifest gained in its window, checkpoint restarts resume at the
  * recorded version (exactly-once planning), the default start is the
  * head (new appends only) with `startingVersion` for replay, and
  * non-append windows refuse loudly.
  */
class StreamTableSourceSpec extends SparkSpec {
  import spark.implicits._

  private val kv = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private val seq = new AtomicInteger(0)

  private def fixture(): (AtomicWarehouse, String) = {
    val root = Files.createTempDirectory("graft-streamsrc-").toString
    val cat = s"gstr${seq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (new AtomicWarehouse(spark, root), cat)
  }

  private def drainAvailableNow(cat: String, table: String, checkpoint: String,
      sinkName: String, startingVersion: Option[Int] = None): Unit = {
    val reader = spark.readStream
    startingVersion.foreach(v => reader.option("startingVersion", v.toString))
    val q = reader.table(s"$cat.$table")
      .writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(GraftSession.streamDrainTimeoutMs),
      "stream did not drain in time")
  }

  test("appends stream exactly-once across restarts; versions are the offsets") {
    val (wh, cat) = fixture()
    wh.append("facts/t", (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    wh.append("facts/t", (100L until 150L).map(i => (i, s"v$i")).toDF("id", "v"))
    val checkpoint = Files.createTempDirectory("graft-streamsrc-ckpt-").toString
    val outDir = Files.createTempDirectory("graft-streamsrc-out-").toString
    def drainToFiles(startingVersion: Option[Int]): Unit = {
      val reader = spark.readStream
      startingVersion.foreach(v => reader.option("startingVersion", v.toString))
      val q = reader.table(s"$cat.facts.t")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(GraftSession.streamDrainTimeoutMs),
        "stream did not drain in time")
    }
    // replay from genesis: both pre-stream appends arrive
    drainToFiles(startingVersion = Some(0))
    val got1 = spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq
    assert(got1.toSet == (0L until 150L).toSet && got1.size == 150, s"got ${got1.size} rows")
    // two more appends land; the SAME checkpoint resumes at the recorded
    // version and sees exactly the new files — nothing replayed or missed
    // (the file sink accumulates, so exact count proves exactly-once)
    wh.append("facts/t", (150L until 160L).map(i => (i, s"v$i")).toDF("id", "v"))
    wh.append("facts/t", (160L until 170L).map(i => (i, s"v$i")).toDF("id", "v"))
    drainToFiles(startingVersion = None)
    val got2 = spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq
    assert(got2.toSet == (0L until 170L).toSet && got2.size == 170,
      s"resume must append exactly the new rows, got ${got2.size}")
    // a fresh checkpoint WITHOUT startingVersion starts at the head: an
    // immediate drain sees nothing, a post-start append arrives on resume
    val checkpoint2 = Files.createTempDirectory("graft-streamsrc-ckpt2-").toString
    val outDir2 = Files.createTempDirectory("graft-streamsrc-out2-").toString
    def drainHead(): Unit = {
      val q = spark.readStream.table(s"$cat.facts.t")
        .writeStream.format("parquet")
        .option("path", outDir2)
        .option("checkpointLocation", checkpoint2)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(GraftSession.streamDrainTimeoutMs))
    }
    drainHead()
    val empty = scala.util.Try(spark.read.parquet(outDir2).count()).getOrElse(0L)
    assert(empty == 0L, "default start is the current head — no replay")
    wh.append("facts/t", Seq((999L, "new")).toDF("id", "v"))
    drainHead()
    assert(spark.read.parquet(outDir2).collect().map(_.getLong(0)).toSet == Set(999L))
  }

  test("renamed columns stream under the current logical names") {
    val (wh, cat) = fixture()
    wh.append("dim/d", Seq((1L, "a")).toDF("id", "v"))
    wh.renameColumn("dim/d", "v", "label")
    wh.append("dim/d", Seq((2L, "b")).toDF("id", "label"))
    val checkpoint = Files.createTempDirectory("graft-streamsrc-ren-").toString
    drainAvailableNow(cat, "dim.d", checkpoint, "sinkren", startingVersion = Some(0))
    val got = spark.sql("SELECT id, label FROM sinkren ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b")), s"got $got")
  }

  test("RENAME TABLE vs a checkpointed stream: new name resumes exactly-once, vacated name refuses") {
    // table identity is PHYSICAL (the rename moves only the catalog name),
    // so a stream's checkpoint — whose offsets are commit versions of the
    // physical directory — stays valid across a rename: resuming under the
    // NEW name continues exactly-once; resuming under the OLD name fails
    // loudly (the vacated name stops resolving) rather than silently
    // reading some other table
    val (wh, cat) = fixture()
    wh.append("facts/t", (0L until 50L).map(i => (i, s"v$i")).toDF("id", "v"))
    val checkpoint = Files.createTempDirectory("graft-streamsrc-rn-ckpt-").toString
    val outDir = Files.createTempDirectory("graft-streamsrc-rn-out-").toString
    def drainTo(table: String): Unit = {
      val q = spark.readStream.option("startingVersion", "0").table(s"$cat.$table")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(GraftSession.streamDrainTimeoutMs))
    }
    drainTo("facts.t")
    assert(spark.read.parquet(outDir).count() == 50L)
    spark.sql(s"ALTER TABLE $cat.facts.t RENAME TO $cat.facts.t2")
    // appends keep landing in the physical directory (Scala API) and via
    // the new logical name (SQL) — both are the same table
    wh.append("facts/t", Seq((100L, "x")).toDF("id", "v"))
    spark.sql(s"INSERT INTO $cat.facts.t2 VALUES (101, 'y')")
    // the vacated name refuses: no silent wrong-table read
    val e = intercept[Exception](drainTo("facts.t"))
    assert(e.getMessage != null, e.toString)
    // the new name resumes the SAME checkpoint and sees exactly the two
    // post-rename rows (file sink accumulates ⇒ exact count = exactly-once)
    drainTo("facts.t2")
    val got = spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq
    assert(got.size == 52 && got.toSet == ((0L until 50L) ++ Seq(100L, 101L)).toSet,
      s"got ${got.size} rows")
  }

  test("graft-cdf streams row-level CDC: inserts + DML slices, maintenance invisible, resume exact") {
    val (wh, _) = fixture()
    wh.setChangeFeed("facts/t", on = true)
    wh.append("facts/t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    wh.deleteWhere("facts/t", kv, Seq(graft.sources.ColEq("id", 2L)))
    wh.updateWhere("facts/t", kv, Seq(graft.sources.ColEq("id", 3L)),
      Seq("v" -> upper(col("v"))))
    val ckpt = Files.createTempDirectory("graft-cdf-ckpt-").toString
    val out = Files.createTempDirectory("graft-cdf-out-").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-cdf")
        .option("root", wh.root).option("table", "facts/t")
        .option("startingVersion", "0").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(GraftSession.streamDrainTimeoutMs))
    }
    drain()
    def byType(): Map[String, Long] = spark.read.parquet(out)
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType() == Map("insert" -> 3L, "delete" -> 1L,
      "update_preimage" -> 1L, "update_postimage" -> 1L), byType().toString)
    // row-preserving maintenance (cdfnoop) is invisible; the resume then
    // delivers exactly the next DML's changes
    wh.compactSmall("facts/t", kv, minBytes = 1L << 20)
    wh.deleteWhereDv("facts/t", kv, Seq(graft.sources.ColEq("id", 1L)))
    drain()
    assert(byType() == Map("insert" -> 3L, "delete" -> 2L,
      "update_preimage" -> 1L, "update_postimage" -> 1L), byType().toString)
    // commit versions label every row; the pre/post images share one
    val vers = spark.read.parquet(out)
      .filter(col("_change_type").startsWith("update"))
      .select("_commit_version").distinct().count()
    assert(vers == 1L)
  }

  test("graft-cdf admission control: a replay lands as version-granular " +
      "rate-limited batches, results identical") {
    val (wh, _) = fixture()
    wh.setChangeFeed("facts/adm", on = true)
    (0 until 4).foreach(k => wh.append("facts/adm",
      Seq((k.toLong, s"v$k")).toDF("id", "v").repartition(1)))
    wh.deleteWhere("facts/adm", kv, Seq(graft.sources.ColEq("id", 1L)))
    val ckpt = Files.createTempDirectory("graft-cdf-adm-ckpt-").toString
    val q = spark.readStream.format("graft-cdf")
      .option("root", wh.root).option("table", "facts/adm")
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("cdfadm")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(GraftSession.streamDrainTimeoutMs))
    val byType = spark.table("cdfadm").groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 4L, "delete" -> 1L), byType.toString)
    // 5 change-bearing versions, 1-file cap → one version per micro-batch
    assert(q.recentProgress.count(_.numInputRows > 0) == 5,
      s"got ${q.recentProgress.count(_.numInputRows > 0)} batches")
  }

  test("graft-cdf byte cap: version-granular, soft, sized from the manifest") {
    val (wh, _) = fixture()
    wh.setChangeFeed("facts/admb", on = true)
    (0 until 3).foreach(k => wh.append("facts/admb",
      Seq((k.toLong, s"v$k")).toDF("id", "v").repartition(1)))
    // a DML slice lands too: byte sizing must also resolve _changes files
    wh.deleteWhere("facts/admb", kv, Seq(graft.sources.ColEq("id", 1L)))
    val before = wh.streamPlanFsCalls.get()
    // a 1-byte cap still admits ≥1 whole VERSION per batch (soft cap, never
    // tears a commit) → 4 change-bearing versions = 4 batches
    val ckpt = Files.createTempDirectory("graft-cdf-byte-ckpt-").toString
    val q = spark.readStream.format("graft-cdf")
      .option("root", wh.root).option("table", "facts/admb")
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "none")
      .option("maxBytesPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("cdfadmb")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(GraftSession.streamDrainTimeoutMs))
    val byType = spark.table("cdfadmb").groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 3L, "delete" -> 1L), byType.toString)
    assert(q.recentProgress.count(_.numInputRows > 0) == 4,
      s"got ${q.recentProgress.count(_.numInputRows > 0)} batches")
    // a generous byte cap admits the whole backlog in one batch, and the
    // admission walk sized everything from manifest stats — zero fs calls
    val ckpt2 = Files.createTempDirectory("graft-cdf-byte2-ckpt-").toString
    val q2 = spark.readStream.format("graft-cdf")
      .option("root", wh.root).option("table", "facts/admb")
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "none")
      .option("maxBytesPerTrigger", "1g")
      .load()
      .writeStream.format("memory").queryName("cdfadmb2")
      .option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(GraftSession.streamDrainTimeoutMs))
    assert(q2.recentProgress.count(_.numInputRows > 0) == 1)
    assert(spark.table("cdfadmb2").count() == 4L)
    assert(wh.streamPlanFsCalls.get() == before,
      s"admission made ${wh.streamPlanFsCalls.get() - before} filesystem calls")
  }

  test("graft-cdf streams across a mid-stream column rename, identical to batch changesBetween") {
    val (wh, _) = fixture()
    wh.setChangeFeed("facts/r", on = true)
    wh.append("facts/r", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    wh.deleteWhere("facts/r", kv, Seq(graft.sources.ColEq("id", 2L)))
    wh.renameColumn("facts/r", "v", "label")
    val s2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("label", StringType, nullable = true)))
    wh.append("facts/r", Seq((3L, "c")).toDF("id", "label"))
    wh.updateWhere("facts/r", s2, Seq(graft.sources.ColEq("id", 3L)),
      Seq("label" -> upper(col("label"))))
    val ckpt = Files.createTempDirectory("graft-cdf-ren-ckpt-").toString
    val out = Files.createTempDirectory("graft-cdf-ren-out-").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-cdf")
        .option("root", wh.root).option("table", "facts/r")
        .option("startingVersion", "0").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(GraftSession.streamDrainTimeoutMs))
    }
    drain()
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Option[String], String, Int)] =
      df.select("id", "label", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2), r.getInt(3)))
        .toSet
    val streamed = canon(spark.read.parquet(out))
    val batch = canon(wh.changesBetween("facts/r", s2, 0, wh.versions().last))
    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    // pre-rename slices carry their values under the CURRENT name — the
    // era projection, not a null-fill
    assert(streamed.exists { case (id, l, t, _) =>
      id == 2L && l.contains("b") && t == "delete" })
    // a rename AFTER the stream started is picked up on resume: the next
    // window's slices read under the newest era
    wh.renameColumn("facts/r", "label", "tag")
    val s3 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tag", StringType, nullable = true)))
    wh.deleteWhere("facts/r", s3, Seq(graft.sources.ColEq("id", 1L)))
    drain()
    // the sink's parquet accumulates under the old header name (`label`
    // column files) union new-name files; read both generations by schema
    val all = spark.read.schema(StructType(Seq(
      StructField("id", LongType), StructField("label", StringType),
      StructField("_change_type", StringType),
      StructField("_commit_version", org.apache.spark.sql.types.IntegerType))))
      .parquet(out)
    assert(all.filter(col("_change_type") === "delete").count() == 2L)
  }

  test("admission control: a genesis replay lands as rate-limited batches " +
      "planned with ZERO filesystem stat calls") {
    val (wh, cat) = fixture()
    // 6 commits × 1 file + one 4-file commit = 10 backlog files
    (0 until 6).foreach(k =>
      wh.append("facts/t", (k * 10L until k * 10L + 10L).map(i => (i, s"v$i"))
        .toDF("id", "v").repartition(1)))
    wh.append("facts/t", (60L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(4))
    val checkpoint = Files.createTempDirectory("graft-streamsrc-adm-").toString
    val outDir = Files.createTempDirectory("graft-streamsrc-admout-").toString
    val before = wh.streamPlanFsCalls.get()
    val q = spark.readStream
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "2")
      .table(s"$cat.facts.t")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(GraftSession.streamDrainTimeoutMs),
      "stream did not drain in time")
    // every row exactly once...
    val got = spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq
    assert(got.toSet == (0L until 100L).toSet && got.size == 100, s"got ${got.size}")
    // ...across ≥5 rate-limited micro-batches (10 files / cap 2), with the
    // 4-file commit split MID-version by the (version, index) offset
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 5, s"expected 5 capped batches, got ${batches.length}")
    // planning sized every partition from manifest-recorded bytes — the
    // 100 TB contract: no O(files) driver stat storm on a backlog replay
    assert(wh.streamPlanFsCalls.get() == before,
      s"planning made ${wh.streamPlanFsCalls.get() - before} filesystem stat calls")
  }

  test("admission control: byte cap, unbounded opt-out, offset back-compat") {
    val (wh, cat) = fixture()
    (0 until 3).foreach(k =>
      wh.append("facts/b", (k * 5L until k * 5L + 5L).map(i => (i, s"v$i"))
        .toDF("id", "v").repartition(1)))
    // a 1-byte cap still admits ≥1 file per batch (soft cap) → 3 batches
    val ck1 = Files.createTempDirectory("graft-streamsrc-byte-").toString
    val q1 = spark.readStream
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "none")
      .option("maxBytesPerTrigger", "1")
      .table(s"$cat.facts.b")
      .writeStream.format("memory").queryName("admbytes")
      .option("checkpointLocation", ck1)
      .trigger(Trigger.AvailableNow()).start()
    assert(q1.awaitTermination(GraftSession.streamDrainTimeoutMs))
    assert(spark.table("admbytes").count() == 15L)
    assert(q1.recentProgress.count(_.numInputRows > 0) == 3,
      "1-byte cap must admit exactly one file per micro-batch")
    // maxFilesPerTrigger=none + no byte cap → the whole backlog in ONE batch
    val ck2 = Files.createTempDirectory("graft-streamsrc-unb-").toString
    val q2 = spark.readStream
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "none")
      .table(s"$cat.facts.b")
      .writeStream.format("memory").queryName("admunb")
      .option("checkpointLocation", ck2)
      .trigger(Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(GraftSession.streamDrainTimeoutMs))
    assert(q2.recentProgress.count(_.numInputRows > 0) == 1)
    // pre-r15 checkpoints carry {"version":v} — parses to the canonical
    // whole-version form and round-trips
    val old = graft.sql.GraftStreamOffset.parse("""{"version":7}""")
    assert(old == graft.sql.GraftStreamOffset(7, -1) && old.json() == """{"version":7}""")
    val mid = graft.sql.GraftStreamOffset.parse("""{"version":7,"index":2}""")
    assert(mid == graft.sql.GraftStreamOffset(7, 2) && mid.json() == """{"version":7,"index":2}""")
  }

  test("writeStream.toTable: exactly-once V2 sink — warehouse to warehouse, " +
      "replays skipped, invariants bind, append-only") {
    val (wh, cat) = fixture()
    wh.append("facts/a", (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(1))
    wh.append("facts/a", (20L until 30L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(1))
    wh.append("facts/b", Seq((999L, "seed")).toDF("id", "v")) // schema recorded
    val ckpt = Files.createTempDirectory("graft-sinktable-ckpt-").toString
    def drain(): Unit = {
      val q = spark.readStream.option("startingVersion", "0")
        .table(s"$cat.facts.a")
        .writeStream.option("checkpointLocation", ckpt)
        .option("txnAppId", "sinktest")
        .trigger(Trigger.AvailableNow())
        .toTable(s"$cat.facts.b")
      assert(q.awaitTermination(GraftSession.streamDrainTimeoutMs),
        "sink stream did not drain in time")
    }
    drain()
    def bIds(): Set[Long] = wh.read("facts/b", kv).collect().map(_.getLong(0)).toSet
    assert(bIds() == (0L until 30L).toSet + 999L, s"got ${bIds().size} ids")
    val hw = wh.lastCommittedBatch("facts/b", "sinktest")
    assert(hw.isDefined, "the epoch ledger must ride the manifest")
    // resume: only the new source commit flows; nothing replays
    wh.append("facts/a", (30L until 35L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(1))
    drain()
    assert(bIds() == (0L until 35L).toSet + 999L,
      "resume must append exactly the new rows")
    assert(wh.lastCommittedBatch("facts/b", "sinktest").get > hw.get)
    // an injected REPLAY (batch id at the high-water) is a no-op and the
    // staging dir is cleaned either way
    val stage = Files.createTempDirectory("graft-sinktable-replay-").toString
    Seq((777L, "dup")).toDF("id", "v").coalesce(1).write
      .mode("overwrite").parquet(stage)
    val leaf = new java.io.File(stage).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).head
    assert(!wh.appendOnceStaged("facts/b", "sinktest",
      wh.lastCommittedBatch("facts/b", "sinktest").get, stage, Seq(leaf), kv))
    assert(!bIds().contains(777L), "replayed epoch leaked rows")
    assert(!new java.io.File(stage).exists(), "replay staging dir not cleaned")
    // invariants bind the streaming sink exactly as API writes
    wh.addConstraint("facts/b", "nonneg", "id >= 0", kv)
    wh.append("facts/a", Seq((-1L, "bad")).toDF("id", "v"))
    val failed = intercept[Exception] { drain() }
    assert(failed.getMessage != null)
    assert(!bIds().contains(-1L), "constraint-violating epoch leaked rows")
    // complete/truncate output mode refuses (async — surfaces on await)
    val q2 = spark.readStream.table(s"$cat.facts.a")
      .groupBy(col("v")).count()
      .writeStream.outputMode("complete")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sinktable-cm-").toString)
      .trigger(Trigger.AvailableNow())
      .toTable(s"$cat.facts.bagg")
    val e = intercept[Exception] {
      q2.awaitTermination(GraftSession.streamDrainTimeoutMs)
    }
    assert(e.getMessage.contains("APPEND output mode only"), e.getMessage)
  }

  test("appendOnceStaged: an EMPTY epoch still advances the high-water " +
      "(metadata-only), and replays below it stay no-ops") {
    val (wh, _) = fixture()
    wh.append("facts/e", Seq((1L, "a")).toDF("id", "v"))
    // an all-empty-tasks epoch: no files, but the ledger must advance or
    // a later crash replays it with whatever data the batch re-derives
    assert(wh.appendOnceStaged("facts/e", "app", 0L,
      Files.createTempDirectory("graft-empty-epoch-").toString, Nil, kv))
    assert(wh.lastCommittedBatch("facts/e", "app").contains(0L))
    assert(!wh.appendOnceStaged("facts/e", "app", 0L,
      Files.createTempDirectory("graft-empty-epoch2-").toString, Nil, kv),
      "replayed empty epoch must be a no-op")
    assert(wh.read("facts/e", kv).count() == 1L)
  }

  test("large files split into byte-range partitions with exact rows " +
      "(Spark's midpoint contract through the streaming reader)") {
    val (wh, cat) = fixture()
    wh.append("facts/big", (0L until 20000L).map(i => (i, s"value-$i"))
      .toDF("id", "v").repartition(1)) // one ~hundreds-of-KB file
    val ckpt = Files.createTempDirectory("graft-split-ckpt-").toString
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    try {
      val q = spark.readStream.option("startingVersion", "0")
        .table(s"$cat.facts.big")
        .writeStream.format("memory").queryName("splitsink")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(GraftSession.streamDrainTimeoutMs))
      val got = spark.table("splitsink").select("id").collect().map(_.getLong(0))
      assert(got.length == 20000 && got.toSet == (0L until 20000L).toSet,
        s"byte-range splits must partition rows exactly, got ${got.length}")
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("non-append windows refuse instead of replaying or dropping rows") {
    val (wh, cat) = fixture()
    wh.append("facts/t", (0L until 50L).map(i => (i, s"v$i")).toDF("id", "v"))
    val checkpoint = Files.createTempDirectory("graft-streamsrc-ref-").toString
    val outDir = Files.createTempDirectory("graft-streamsrc-refout-").toString
    def drain(): Unit = {
      val q = spark.readStream.option("startingVersion", "0")
        .table(s"$cat.facts.t")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(GraftSession.streamDrainTimeoutMs))
    }
    drain()
    assert(spark.read.parquet(outDir).count() == 50L)
    // a copy-on-write delete inside the next window breaks append-only
    wh.deleteWhere("facts/t", kv, Seq(graft.sources.ColEq("id", 7L)))
    wh.append("facts/t", Seq((100L, "x")).toDF("id", "v"))
    val e = intercept[Exception] { drain() }
    assert(e.getMessage != null, "non-append window must refuse")
  }
}
