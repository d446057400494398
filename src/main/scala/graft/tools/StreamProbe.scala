package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Phase-level wall-clock attribution for the stream bench fixtures
  * (`q10_stream`, `q11_stream`): chunk prep vs stream drain vs final
  * aggregation, plus per-micro-batch durations from the streaming progress
  * log. The bench medians only say "q11_stream costs 9 s"; this says which
  * seconds are operator work (stateful shuffle + state store commits) and
  * which are harness floor (micro-batch scheduling, sink I/O), which is the
  * evidence needed to adjudicate a bench regression as real-vs-environment.
  *
  * Usage: runMain graft.tools.StreamProbe [sfDir] [reps]
  */
object StreamProbe {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val shuffleParts = if (args.length > 2) args(2).toInt else 32
    val s = GraftSession.builder(shufflePartitions = shuffleParts).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    println(s"shuffle.partitions=$shuffleParts")
    import s.implicits._

    def events = graft.SparkEntry.eventsTable(s, dir) // ts normalized to nanos long

    // --- q10_stream shape: chunk prep once, then stream reps ---
    val (eDir, ePrep) = timed {
      val inDir = Files.createTempDirectory("probe-estream-in-").toString
      val ev = events
      (0 until 3).foreach { i =>
        val tmp = Files.createTempDirectory(s"probe-estream-c$i-").toString + "/out"
        ev.filter(pmod(col("event_id"), lit(3)) === i).coalesce(1).write.parquet(tmp)
        val part = graft.LocalFs.onlyParquet(tmp)
        Files.move(part, Paths.get(inDir, f"chunk_$i%02d.parquet"),
          StandardCopyOption.ATOMIC_MOVE)
      }
      inDir
    }
    println(f"q10_stream chunk_prep: $ePrep%.2f s")
    (1 to reps).foreach { r =>
      val (df, drain) = timed {
        graft.streaming.EventStream.hourlyAgg(s, eDir, s"probe_q10_$r")
      }
      val (n, fin) = timed(df.orderBy(col("hour"), col("event_type")).count())
      val prog = s.streams.active
      println(f"q10_stream rep$r: drain=$drain%.2f s final_agg=$fin%.2f s rows=$n active=${prog.length}")
    }

    // --- q11_stream shape ---
    val (sDir, sPrep) = timed {
      val inDir = Files.createTempDirectory("probe-sstream-in-").toString
      val chunked = events
        .select(col("user_id"), expr("ts DIV 1000").as("us"), col("event_id"))
        .withColumn("c",
          ntile(3).over(Window.orderBy(col("us"), col("user_id"), col("event_id"))))
      (1 to 3).foreach { i =>
        val tmp = Files.createTempDirectory(s"probe-sstream-c$i-").toString + "/out"
        chunked.filter(col("c") === i).select(col("user_id"), col("us"))
          .coalesce(1).write.parquet(tmp)
        val part = graft.LocalFs.onlyParquet(tmp)
        Files.move(part, Paths.get(inDir, f"chunk_$i%02d.parquet"),
          StandardCopyOption.ATOMIC_MOVE)
      }
      inDir
    }
    println(f"q11_stream chunk_prep: $sPrep%.2f s")
    val evSchema = events.select(col("user_id"), expr("ts DIV 1000").as("us")).schema
    (1 to reps).foreach { r =>
      val ckpt = Files.createTempDirectory("probe-sstream-ck-").toString
      val outDir = Files.createTempDirectory("probe-sstream-out-").toString + "/state"
      val batchTimes = scala.collection.mutable.ArrayBuffer[Double]()
      val drain = timed {
        val stream = s.readStream.schema(evSchema)
          .option("maxFilesPerTrigger", "1").parquet(sDir)
          .as[graft.streaming.Sessionize.Event]
        val q = graft.streaming.Sessionize.sessions(stream, gapUs = 1800000000L)
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: Dataset[graft.streaming.Sessionize.PerUser], bid: Long) =>
            val t0 = System.nanoTime()
            b.toDF().withColumn("bid", lit(bid)).write.mode("append").parquet(outDir)
            batchTimes += (System.nanoTime() - t0) / 1e9
            ()
          }
          .start()
        if (!q.awaitTermination(GraftSession.streamDrainTimeoutMs)) q.stop()
        // per-micro-batch durations as the engine saw them
        q.recentProgress.foreach { p =>
          println(f"  batch ${p.batchId}: ${p.durationMs.getOrDefault("triggerExecution", -1L)} ms" +
            s" (addBatch=${p.durationMs.getOrDefault("addBatch", -1L)}," +
            s" getBatch=${p.durationMs.getOrDefault("getBatch", -1L)}," +
            s" commit=${p.durationMs.getOrDefault("commitOffsets", -1L)}," +
            s" rows=${p.numInputRows})")
        }
      }
      val (n, fin) = timed {
        s.read.parquet(outDir)
          .groupBy(col("user_id"))
          .agg(max_by(struct(col("n_sessions"), col("n_events")), col("bid")).as("w"))
          .count()
      }
      println(f"q11_stream rep$r: drain=${drain._2}%.2f s sink_writes=${batchTimes.map(t => f"$t%.2f").mkString(",")} final_agg=$fin%.2f s rows=$n")
    }
    s.stop()
  }
}
