package graft.tools

import java.nio.file.Files

import graft.GraftSession
import graft.sources.AtomicWarehouse
import org.apache.spark.sql.functions._

/** Scale shape of the streaming table source's GENESIS-REPLAY regime — the
  * r14 verdict's one weak-for-scale component, closed in r15 by admission
  * control + log-planned partitions. For a backlog grown ×1/×4/×16 in FILE
  * COUNT (the dimension that hurt: planning used to stat every file
  * serially on the driver), a `startingVersion=0` replay capped at
  * `maxFilesPerTrigger` must show:
  *
  *   - `plan_fs_calls` == 0 at every scale (partitions sized from
  *     manifest-recorded bytes — the log, never the filesystem);
  *   - `batches` tracking ceil(files / cap) — bounded micro-batches, the
  *     all-or-nothing unit gone, including SPLITS INSIDE one large commit
  *     (half the files land in a single commit here);
  *   - rows exact (the rate limiting can't drop or replay a file).
  *
  * `sbt "runMain graft.tools.BacklogProbe [1,4,16] [cap]"` → one JSON line
  * per mult to stdout and target/backlogprobe.json.
  */
object BacklogProbe {
  def main(args: Array[String]): Unit = {
    val mults = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 4, 16))
    val cap = if (args.length > 1) args(1).toInt else 8
    val spark = GraftSession.get()
    import spark.implicits._

    val out = new java.io.PrintWriter(new java.io.FileWriter("target/backlogprobe.json"))
    def emit(l: String): Unit = { println(l); out.println(l); out.flush() }

    mults.foreach { mult =>
      val commits = 8 * mult // half the backlog: many small commits...
      val rowsPerFile = 100L
      val root = Files.createTempDirectory(s"graft-backlog-x$mult-").toString
      val wh = new AtomicWarehouse(spark, root)
      wh.setChangeFeed("t", on = true) // the CDF phase below replays the same log
      (0 until commits).foreach { c =>
        wh.append("t", spark.range(c * rowsPerFile, (c + 1) * rowsPerFile)
          .select(col("id"), concat(lit("v"), col("id")).as("v")).coalesce(1))
      }
      // ...and ONE large commit holding as many files again (the
      // (version, index) split regime — a single big commit must not
      // become a single big batch)
      val bigLo = commits * rowsPerFile
      wh.append("t", spark.range(bigLo, bigLo + commits * rowsPerFile)
        .select(col("id"), concat(lit("v"), col("id")).as("v"))
        .repartition(commits))
      val files = wh.describe("t").files
      val totalRows = (2L * commits) * rowsPerFile

      val cat = s"gblog$mult"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sql.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      val ckpt = Files.createTempDirectory(s"graft-backlog-ckpt-x$mult-").toString
      val fsBefore = wh.streamPlanFsCalls.get()
      val t0 = System.nanoTime()
      val q = spark.readStream
        .option("startingVersion", "0")
        .option("maxFilesPerTrigger", cap.toString)
        .table(s"$cat.t")
        .writeStream.format("memory").queryName(s"backlog$mult")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      require(q.awaitTermination(GraftSession.streamDrainTimeoutMs),
        s"backlog replay did not drain at x$mult")
      val wall = (System.nanoTime() - t0) / 1e9
      val got = spark.table(s"backlog$mult").count()
      require(got == totalRows, s"under/over-read: $got rows, expected $totalRows")
      val batches = q.recentProgress.count(_.numInputRows > 0)
      val fsCalls = wh.streamPlanFsCalls.get() - fsBefore
      require(fsCalls == 0L,
        s"backlog planning made $fsCalls filesystem stat calls at x$mult")
      emit(s"""{"probe":"backlog","mult":$mult,"files":$files,"cap":$cap,""" +
        s""""rows":$totalRows,"batches":$batches,"plan_fs_calls":$fsCalls,""" +
        s""""wall_s":${f"$wall%.3f"}}""")

      // the SAME backlog replayed through graft-cdf under a BYTE cap:
      // version-granular admission sized from manifest-recorded stats —
      // zero filesystem calls however many files the backlog holds, rows
      // exact, and the byte budget bounds each micro-batch (≥1 whole
      // version, soft). The r15 table-source regime, now on the CDF source.
      val ckptCdf = Files.createTempDirectory(s"graft-backlog-cdfck-x$mult-").toString
      val fsBeforeCdf = wh.streamPlanFsCalls.get()
      val t1 = System.nanoTime()
      val qc = spark.readStream.format("graft-cdf")
        .option("root", root).option("table", "t")
        .option("startingVersion", "0")
        .option("maxFilesPerTrigger", "none")
        .option("maxBytesPerTrigger", (cap * 2048).toString)
        .load()
        .writeStream.format("memory").queryName(s"cdfbacklog$mult")
        .option("checkpointLocation", ckptCdf)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      require(qc.awaitTermination(GraftSession.streamDrainTimeoutMs),
        s"cdf backlog replay did not drain at x$mult")
      val wallCdf = (System.nanoTime() - t1) / 1e9
      val gotCdf = spark.table(s"cdfbacklog$mult")
        .filter(col("_change_type") === "insert").count()
      require(gotCdf == totalRows, s"cdf under/over-read: $gotCdf vs $totalRows")
      val batchesCdf = qc.recentProgress.count(_.numInputRows > 0)
      val fsCallsCdf = wh.streamPlanFsCalls.get() - fsBeforeCdf
      require(fsCallsCdf == 0L,
        s"cdf admission made $fsCallsCdf filesystem stat calls at x$mult")
      emit(s"""{"probe":"backlog_cdf","mult":$mult,"files":$files,""" +
        s""""byte_cap":${cap * 2048},"rows":$totalRows,"batches":$batchesCdf,""" +
        s""""plan_fs_calls":$fsCallsCdf,"wall_s":${f"$wallCdf%.3f"}}""")
    }
    out.close()
    spark.stop()
  }
}
