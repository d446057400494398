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
