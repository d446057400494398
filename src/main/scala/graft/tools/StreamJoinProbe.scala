package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Bounded-state evidence for the stream-stream interval join: the claim
  * that makes [[graft.streaming.StreamJoins]] a forever-runnable operator is
  * that join STATE tracks the watermark horizon (skew × rate), never stream
  * LENGTH. This probe grows the stream ×1/×2/×4 in wall-time span at the
  * SAME event rate, same 30-minute watermarks, same 45-minute join window,
  * and the same 15 minutes of events per micro-batch (chunk count scales
  * with the span — a fixed chunk count would grow the per-batch span and
  * measure batch size, not the horizon), then records the state store's
  * peak row count from the query's own progress metrics
  * (`stateOperators.numRowsTotal`) — input rows grow linearly, peak state
  * must stay flat at the horizon population (≈ rate × (delay + lag +
  * batch span) per side). Matches are verified exact against the batch
  * join so the bound can't pass by dropping rows the watermark should
  * have kept.
  *
  * `sbt "runMain graft.tools.StreamJoinProbe [1,2,4]"` → one JSON line per
  * mult to stdout and target/streamjoinprobe.json.
  */
object StreamJoinProbe {
  private val t0 = 1700000000000000L // epoch micros
  private val minute = 60000000L

  private def writeChunks(df: DataFrame, orderCol: String, nChunks: Int,
      tag: String): String = {
    val dir = Files.createTempDirectory(s"graft-$tag-in-").toString
    val n = df.count()
    val per = math.max(1L, (n + nChunks - 1) / nChunks)
    // time-ordered chunk files so the watermark advances monotonically —
    // the append-log arrival shape
    val ranked = df.withColumn("__rk",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))))
    (0 until nChunks).foreach { i =>
      val tmp = Files.createTempDirectory(s"graft-$tag-c$i-").toString + "/out"
      ranked.filter(col("__rk") > i * per && col("__rk") <= (i + 1) * per)
        .drop("__rk").coalesce(1).write.parquet(tmp)
      val part = {
        val s = Files.list(Paths.get(tmp))
        try s.filter(_.toString.endsWith(".parquet")).findFirst
        finally s.close()
      }
      if (part.isPresent)
        Files.move(part.get, Paths.get(dir, f"chunk_$i%02d.parquet"),
          StandardCopyOption.ATOMIC_MOVE)
    }
    dir
  }

  def main(args: Array[String]): Unit = {
    val mults = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 2, 4))
    val spark0 = GraftSession.get()
    spark0.sparkContext.setLogLevel("WARN")
    val out = new java.io.PrintWriter(
      new java.io.FileWriter("target/streamjoinprobe.json"))
    try {
      mults.foreach { m =>
        val spark = GraftSession.streamSession(spark0, statePartitions = 8)
        // one click per minute across m×4 hours, 50 users round-robin;
        // an impression every 10 minutes
        val nMin = 240L * m
        val clicks = spark.range(nMin).select(
          col("id").as("event_id"), pmod(col("id"), lit(50L)).as("user_id"),
          timestamp_micros(lit(t0) + col("id") * minute).as("tsm"))
        val imps = spark.range(nMin / 10).select(
          (col("id") * 10).as("campaign_id"),
          pmod(col("id") * 10, lit(50L)).as("user_id"),
          timestamp_micros(lit(t0) + col("id") * 10 * minute).as("imp_tsm"))
        val lDir = writeChunks(clicks, "tsm", 16 * m, s"sjp-l$m")
        val rDir = writeChunks(imps, "imp_tsm", 16 * m, s"sjp-r$m")
        def side(dir: String, schema: org.apache.spark.sql.types.StructType) =
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)
        val joined = graft.streaming.StreamJoins.intervalJoin(
          side(lDir, clicks.schema), side(rDir, imps.schema), Seq("user_id"),
          "tsm", "imp_tsm", "45 minutes", "30 minutes", "30 minutes")
        val name = s"sjp_$m"
        spark.catalog.dropTempView(name)
        val start = System.nanoTime()
        val q = joined.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        if (!q.awaitTermination(GraftSession.streamDrainTimeoutMs))
          { q.stop(); sys.error(s"probe stream x$m failed to drain") }
        val wall = (System.nanoTime() - start) / 1e9
        val peakState = q.recentProgress
          .flatMap(_.stateOperators.map(_.numRowsTotal)).foldLeft(0L)(math.max)
        val matches = spark.table(name).count()
        // exactness: the same join as one batch — with ordered arrival and
        // a horizon ≥ the join window, the stream must drop NOTHING
        val expected = clicks.alias("l").join(imps.alias("r"),
          col("l.user_id") === col("r.user_id") &&
            col("l.tsm") >= col("r.imp_tsm") &&
            col("l.tsm") < col("r.imp_tsm") + expr("INTERVAL 45 minutes")).count()
        require(matches == expected, s"x$m: stream $matches != batch $expected")
        val line = s"""{"probe":"streamjoin","mult":$m,"input_rows":${nMin + nMin / 10},""" +
          s""""matches":$matches,"peak_state_rows":$peakState,"wall_s":${math.round(wall * 1000) / 1000.0}}"""
        println(line); out.println(line); out.flush()
      }
    } finally out.close()
  }
}
