package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.GraftSession
import graft.sources.AtomicWarehouse
import graft.streaming.ScdStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Decomposes the `etl_scd2_stream` drain floor: the same three supplier
  * update batches folded (a) directly through `processBatch` — no
  * streaming machinery — and (b) through the full AvailableNow
  * `maxFilesPerTrigger=1` drain, several reps each. The gap between (a)
  * and (b) is Structured Streaming's per-micro-batch overhead (offset/commit
  * WAL fsyncs, file-source listing, trigger scheduling); (a) alone is the
  * engine's fold cost (ledger probe + SCD2 join + transactional replace).
  * Output: one JSON line per rep to stdout and target/scdprobe.json.
  */
object ScdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = GraftSession.builder().appName("scd-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
    val batches = Seq(
      sup.select(col("s_suppkey"), col("s_nationkey").cast(LongType).as("attr")),
      sup.filter(col("s_suppkey") % 4 === 0).select(col("s_suppkey"),
        (col("s_nationkey") + 100).cast(LongType).as("attr")),
      sup.filter(col("s_suppkey") % 6 === 0).select(col("s_suppkey"),
        (col("s_nationkey") + 200).cast(LongType).as("attr")))
    val baseSchema = StructType(Seq(
      StructField("s_suppkey", LongType), StructField("attr", LongType)))

    // one shared input dir, written once (the bench fixture caches too)
    val inDir = Files.createTempDirectory("graft-scdprobe-in-").toString
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = Files.createTempDirectory(s"graft-scdprobe-c$i-").toString + "/out"
      df.coalesce(1).write.parquet(tmp)
      Files.move(graft.LocalFs.onlyParquet(tmp), Paths.get(inDir, f"chunk_$i%02d.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val chunkDfs = (0 until 3).map(i =>
      spark.read.schema(baseSchema).parquet(f"$inDir/chunk_$i%02d.parquet"))

    val out = new StringBuilder
    def emit(line: String): Unit = { println(line); out.append(line).append('\n') }
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // count driver JOBS per fold — the fold cost at this size is fixed
    // per-job latency, so the job count IS the cost model
    val jobCount = new java.util.concurrent.atomic.AtomicInteger()
    val jobLog = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        jobLog.add(Seq("callSite.short", "spark.job.description", "spark.sql.execution.root.id")
          .flatMap(k => Option(j.properties.getProperty(k))).headOption.getOrElse("?"))
      }
    })

    (1 to reps).foreach { rep =>
      // (a) direct folds, no streaming
      val whd = new AtomicWarehouse(spark,
        Files.createTempDirectory("graft-scdprobe-whd-").toString)
      val std = new ScdStream(whd, "provider", Seq("s_suppkey"), Seq("attr"), baseSchema)
      val perBatch = chunkDfs.zipWithIndex.map { case (df, i) =>
        jobCount.set(0)
        jobLog.clear()
        val t = timed(std.processBatch(df, i.toLong))
        if (rep == reps && i == 2) {
          import scala.jdk.CollectionConverters._
          System.err.println(s"[scdprobe] last fold's jobs: " +
            jobLog.asScala.mkString(" | "))
        }
        (t, jobCount.get())
      }
      val directRead = timed(
        std.dim.history().orderBy(col("s_suppkey"), col("valid_from"))
          .write.format("noop").mode("overwrite").save())
      // (b) the full streamed drain (fresh warehouse + checkpoint)
      val whs = new AtomicWarehouse(GraftSession.streamSession(spark),
        Files.createTempDirectory("graft-scdprobe-whs-").toString)
      val sts = new ScdStream(whs, "provider", Seq("s_suppkey"), Seq("attr"), baseSchema)
      val ckpt = Files.createTempDirectory("graft-scdprobe-ck-").toString
      var progress = ""
      val streamed = timed {
        val sq = sts.start(inDir, ckpt)
        if (!sq.awaitTermination(120000)) { sq.stop(); sys.error("drain stall") }
        // Spark's own per-micro-batch decomposition: addBatch is the fold,
        // the rest is streaming machinery (source listing, WAL commits)
        progress = sq.recentProgress.map { p =>
          val d = p.durationMs
          s"""{"batch":${p.batchId},"total":${d.getOrDefault("triggerExecution", -1L)},""" +
            s""""addBatch":${d.getOrDefault("addBatch", -1L)},""" +
            s""""getBatch":${d.getOrDefault("getBatch", -1L)},""" +
            s""""latestOffset":${d.getOrDefault("latestOffset", -1L)},""" +
            s""""walCommit":${d.getOrDefault("walCommit", -1L)},""" +
            s""""commitOffsets":${d.getOrDefault("commitOffsets", -1L)}}"""
        }.mkString("[", ",", "]")
      }
      val streamedRead = timed(
        sts.dim.history().orderBy(col("s_suppkey"), col("valid_from"))
          .write.format("noop").mode("overwrite").save())
      emit(s"""{"rep":$rep,"fold_s":[${perBatch.map(t => f"${t._1}%.3f").mkString(",")}],""" +
        s""""fold_jobs":[${perBatch.map(_._2).mkString(",")}],""" +
        f""""fold_total_s":${perBatch.map(_._1).sum}%.3f,"read_s":$directRead%.3f,""" +
        f""""streamed_s":$streamed%.3f,"streamed_read_s":$streamedRead%.3f,""" +
        f""""stream_overhead_s":${streamed - perBatch.map(_._1).sum}%.3f,""" +
        s""""micro_batches_ms":$progress}""")
    }
    Files.createDirectories(Paths.get("target"))
    Files.write(Paths.get("target/scdprobe.json"), out.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
