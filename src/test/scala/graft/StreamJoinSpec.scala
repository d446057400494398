package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.StreamJoins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval joins must reproduce the batch
  * interval join when watermarks keep every row live, drop late rows when
  * they don't (bounded state — the property that lets the join run forever),
  * and emit null-extended left rows under left_outer once the watermark
  * proves no match can arrive.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def writeChunks(dir: String, tag: String, chunks: Seq[DataFrame]): Unit =
    chunks.zipWithIndex.foreach { case (c, i) =>
      val tmp = Files.createTempDirectory(s"graft-$tag-c$i-").toString + "/out"
      c.coalesce(1).write.parquet(tmp)
      val part = graft.LocalFs.onlyParquet(tmp)
      Files.move(part, Paths.get(dir, f"chunk_$i%02d.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
    }

  test("inner stream-stream interval join over chunked arrival matches the batch join") {
    val ev = SparkEntry.eventsTable(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"event_id", timestamp_micros(expr("ts DIV 1000")).as("tsm"))
    val clicks = ev
    val imps = ev.filter(pmod($"event_id", lit(10)) === 0)
      .select($"user_id", $"event_id".as("campaign_id"), $"tsm".as("imp_tsm"))

    val lDir = Files.createTempDirectory("graft-sj-l-").toString
    val rDir = Files.createTempDirectory("graft-sj-r-").toString
    writeChunks(lDir, "sjl", (0 until 3).map(i =>
      clicks.filter(pmod($"event_id", lit(3)) === i)))
    writeChunks(rDir, "sjr", (0 until 2).map(i =>
      imps.filter(pmod($"campaign_id", lit(2)) === i)))

    val got = StreamJoins.fileIntervalJoin(spark, lDir, rDir, Seq("user_id"),
      "tsm", "imp_tsm", "45 minutes", "3650 days", "3650 days", "sj_inner")
      .select($"event_id", $"campaign_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val expected = clicks.alias("l").join(imps.alias("r"),
        $"l.user_id" === $"r.user_id" && $"l.tsm" >= $"r.imp_tsm" &&
          $"l.tsm" < $"r.imp_tsm" + expr("INTERVAL 45 minutes"))
      .select($"l.event_id", $"r.campaign_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(expected.nonEmpty, "fixture must produce matches")
    assert(got == expected,
      s"stream ∖ batch: ${got -- expected}; batch ∖ stream: ${expected -- got}")
  }

  test("a click later than the watermark horizon is dropped — bounded state, not replay") {
    val t0 = 1700000000000000L // epoch micros
    def clickRow(user: Long, id: Long, us: Long) = (user, id, us)
    val lDir = Files.createTempDirectory("graft-sjw-l-").toString
    val rDir = Files.createTempDirectory("graft-sjw-r-").toString
    def clicksDf(rows: Seq[(Long, Long, Long)]) = rows.toDF("user_id", "event_id", "us")
      .select($"user_id", $"event_id", timestamp_micros($"us").as("tsm"))
    def impsDf(rows: Seq[(Long, Long, Long)]) = rows.toDF("user_id", "campaign_id", "us")
      .select($"user_id", $"campaign_id", timestamp_micros($"us").as("imp_tsm"))
    val min = 60000000L
    // chunk 0: an in-window click + a far-future click that drags the
    // watermark hours past t0; chunk 1: a filler batch during which the
    // t0 impression's state is EVICTED (t0 + 45min lag < watermark —
    // eviction runs at end-of-batch, so the straggler needs its own later
    // batch); chunk 2: a click back at t0+5min — its match state is gone
    writeChunks(lDir, "sjwl", Seq(
      clicksDf(Seq(clickRow(1L, 10L, t0 + 10 * min), clickRow(2L, 99L, t0 + 180 * min))),
      clicksDf(Seq(clickRow(3L, 30L, t0 + 181 * min))),
      clicksDf(Seq(clickRow(1L, 11L, t0 + 5 * min)))))
    writeChunks(rDir, "sjwr", Seq(
      impsDf(Seq((1L, 1000L, t0), (2L, 2000L, t0 + 180 * min)))))

    val got = StreamJoins.fileIntervalJoin(spark, lDir, rDir, Seq("user_id"),
      "tsm", "imp_tsm", "45 minutes", "30 minutes", "30 minutes", "sj_late")
      .select($"event_id", $"campaign_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got.contains((10L, 1000L)), s"in-window click must match, got $got")
    assert(!got.exists(_._1 == 11L),
      s"the late click must be dropped by the watermark, got $got")
  }

  test("stream-static join: a graft catalog table enriches a stream, current per micro-batch") {
    val root = java.nio.file.Files.createTempDirectory("graft-ss-").toString
    val cat = "gssj1"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val wh = new graft.sources.AtomicWarehouse(spark, root)
    wh.append("dim/users", Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier"))
    val lDir = java.nio.file.Files.createTempDirectory("graft-ss-l-").toString
    writeChunks(lDir, "ssl", Seq(
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("user_id", "event_id"),
      Seq((1L, 11L), (9L, 90L)).toDF("user_id", "event_id")))
    val evSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType)))
    def stream = spark.readStream
      .schema(evSchema).option("maxFilesPerTrigger", "1").parquet(lDir)
    val joined = stream.join(spark.table(s"$cat.dim.users"), Seq("user_id"), "inner")
    // the static graft side is CURRENT per micro-batch (GraftFileIndex
    // lists the manifest at execution, not analysis — Delta's stream-static
    // freshness): a dim row appended from inside batch 0 joins batch 1's
    // events. Pin that semantics deterministically: foreachBatch blocks
    // batch progression, so the append strictly precedes batch 1.
    val seen = scala.collection.mutable.Set[(Long, Long, String)]()
    val q = joined.writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        if (id == 0L)
          wh.append("dim/users", Seq((9L, "bronze")).toDF("user_id", "tier"))
        b.collect().foreach(r => seen += ((r.getLong(0), r.getLong(1), r.getString(2))))
        ()
      }
      .start()
    assert(q.awaitTermination(graft.GraftSession.streamDrainTimeoutMs),
      "stream-static join failed to drain")
    assert(seen.toSet == Set((1L, 10L, "gold"), (2L, 20L, "silver"),
        (1L, 11L, "gold"), (9L, 90L, "bronze")),
      s"got $seen — batch 1's user 9 must join the dim row batch 0 appended; " +
        "user 3 never matches")
  }

  test("left_outer emits the unmatched click with nulls once the watermark passes") {
    val t0 = 1700000000000000L
    val min = 60000000L
    val lDir = Files.createTempDirectory("graft-sjo-l-").toString
    val rDir = Files.createTempDirectory("graft-sjo-r-").toString
    def clicksDf(rows: Seq[(Long, Long, Long)]) = rows.toDF("user_id", "event_id", "us")
      .select($"user_id", $"event_id", timestamp_micros($"us").as("tsm"))
    def impsDf(rows: Seq[(Long, Long, Long)]) = rows.toDF("user_id", "campaign_id", "us")
      .select($"user_id", $"campaign_id", timestamp_micros($"us").as("imp_tsm"))
    // user 1's click has no impression; sentinel rows hours later advance
    // BOTH watermarks so the unmatched row's state can finalize
    writeChunks(lDir, "sjol", Seq(
      clicksDf(Seq((1L, 10L, t0), (9L, 90L, t0 + 600 * min)))))
    writeChunks(rDir, "sjor", Seq(
      impsDf(Seq((9L, 9000L, t0 + 600 * min)))))

    val got = StreamJoins.fileIntervalJoin(spark, lDir, rDir, Seq("user_id"),
      "tsm", "imp_tsm", "45 minutes", "10 minutes", "10 minutes", "sj_outer",
      joinType = "left_outer")
      .select($"event_id", $"campaign_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    assert(got.contains((10L, -1L)),
      s"unmatched click must emit null-extended after the watermark passes, got $got")
    assert(got.contains((90L, 9000L)), s"sentinel match must emit, got $got")
  }

  test("spark.sql interval join over graft streaming sources — the watermark " +
      "declaration is the only DataFrame-side step (the SQL boundary)") {
    // the ops-user route to a stream-stream join: both sides are graft
    // catalog tables read as streams, the JOIN (key equality + time range)
    // is plain SQL text over temp views — only withWatermark has no OSS
    // Spark SQL syntax, which is exactly where the README draws the
    // DataFrame/SQL boundary. Results ≡ the batch interval join when
    // watermarks keep every row live.
    val root = Files.createTempDirectory("graft-sjsql-").toString
    val cat = "gsjsql1"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val wh = new graft.sources.AtomicWarehouse(spark, root)
    val ev = SparkEntry.eventsTable(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"event_id", timestamp_micros(expr("ts DIV 1000")).as("tsm"))
    val imps = ev.filter(pmod($"event_id", lit(10)) === 0)
      .select($"user_id", $"event_id".as("campaign_id"), $"tsm".as("imp_tsm"))
    wh.append("facts/clicks", ev)
    wh.append("facts/imps", imps)
    spark.readStream.option("startingVersion", "0").table(s"$cat.facts.clicks")
      .withWatermark("tsm", "3650 days").createOrReplaceTempView("sql_clicks")
    spark.readStream.option("startingVersion", "0").table(s"$cat.facts.imps")
      .withWatermark("imp_tsm", "3650 days").createOrReplaceTempView("sql_imps")
    val joined = spark.sql(
      """SELECT c.event_id, i.campaign_id FROM sql_clicks c JOIN sql_imps i
        |ON c.user_id = i.user_id AND c.tsm >= i.imp_tsm
        | AND c.tsm < i.imp_tsm + INTERVAL 45 MINUTES""".stripMargin)
    val got = StreamJoins.drain(joined, "sjsql")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = ev.alias("l").join(imps.alias("r"),
        $"l.user_id" === $"r.user_id" && $"l.tsm" >= $"r.imp_tsm" &&
          $"l.tsm" < $"r.imp_tsm" + expr("INTERVAL 45 minutes"))
      .select($"l.event_id", $"r.campaign_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must produce matches")
    assert(got == expected,
      s"sql-stream ∖ batch: ${got -- expected}; batch ∖ sql-stream: ${expected -- got}")
  }
}
