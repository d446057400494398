package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.Sessionize
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming sessionization with custom per-user state must reproduce the
  * batch window query (`q11_sessionize` shape) when the same events arrive
  * chunked across micro-batches in time order (the append-log shape).
  */
class SessionizeStreamSpec extends SparkSpec {
  import spark.implicits._

  private val gapUs = 1800000000L // 30 minutes

  test("flatMapGroupsWithState sessions across 3 micro-batches match the batch window") {
    val dir = Files.createTempDirectory("graft-sess-in-").toString
    val ckpt = Files.createTempDirectory("graft-sess-ck-").toString

    val ev = SparkEntry.eventsTable(spark, "/root/testdata/sf0.001")
      .select($"user_id", expr("ts DIV 1000").as("us"))

    // three time-ordered chunk files: per-user order across chunks follows
    // from the global time sort
    val rows = ev.orderBy("us").as[Sessionize.Event].collect()
    rows.grouped((rows.length + 2) / 3).zipWithIndex.foreach { case (chunk, i) =>
      val tmp = Files.createTempDirectory(s"graft-sess-c$i-").toString + "/out"
      chunk.toSeq.toDS().coalesce(1).write.parquet(tmp)
      val part = graft.LocalFs.onlyParquet(tmp)
      Files.move(part, Paths.get(dir, f"chunk_$i%02d.parquet"), StandardCopyOption.ATOMIC_MOVE)
    }

    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .as[Sessionize.Event]

    val latest = scala.collection.concurrent.TrieMap.empty[Long, (Long, Long)]
    var batches = 0
    val q = Sessionize.sessions(stream, gapUs).writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Sessionize.PerUser], _: Long) =>
        batches += 1
        b.collect().foreach { p =>
          assert(p.n_late === 0L, s"time-ordered chunks must not count late events (user ${p.user_id})")
          latest(p.user_id) = (p.n_sessions, p.n_events)
        }
      }
      .start()
    assert(q.awaitTermination(180000), "stream failed to drain within 180 s")

    assert(batches >= 3, s"expected one micro-batch per chunk, got $batches")

    val w = Window.partitionBy($"user_id").orderBy($"us")
    val expected = ev
      .withColumn("prev", lag($"us", 1).over(w))
      .withColumn("ns", when($"prev".isNull || $"us" - $"prev" > gapUs, 1L).otherwise(0L))
      .groupBy($"user_id")
      .agg(sum($"ns").as("n_sessions"), count(lit(1)).as("n_events"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

    assert(latest.size === expected.size)
    expected.foreach { case (uid, want) =>
      assert(latest(uid) === want, s"user $uid: streaming ${latest(uid)} vs batch $want")
    }
  }
}
