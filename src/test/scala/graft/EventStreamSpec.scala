package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp

import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** EventStream's batch-equivalence contract: with a watermark delay wider
  * than the data's event-time span, the complete-mode drain must equal the
  * batch aggregation for any file batching — including late-arriving files.
  */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  test("2-batch drain equals the batch aggregation, late file included") {
    val dir = Files.createTempDirectory("graft-estream-spec-").toString
    // batch 2 carries EARLIER events than batch 1: with the wide watermark
    // nothing is late, so they still aggregate into their own windows
    val chunks = Seq(
      Seq((1L, "2024-01-01 10:05:00", "click", 2.0),
        (2L, "2024-01-01 11:20:00", "view", 3.0)),
      Seq((3L, "2024-01-01 10:40:00", "click", 5.0),
        (4L, "2024-01-01 09:10:00", "view", 7.0)))
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory(s"graft-estream-spec-c$i-").toString + "/out"
      rows.map { case (id, ts, t, v) =>
        (id, Timestamp.valueOf(ts).getTime * 1000000L, t, v) // nanos long like events.ts
      }.toDF("event_id", "ts", "event_type", "value")
        .coalesce(1).write.parquet(tmp)
      val part = graft.LocalFs.onlyParquet(tmp)
      Files.move(part, Paths.get(dir, f"chunk_$i%02d.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val got = EventStream.hourlyAgg(spark, dir, "es_spec_out")
      .orderBy("hour", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01 09:00:00", "view", 1L, 7.0),
      ("2024-01-01 10:00:00", "click", 2L, 7.0),
      ("2024-01-01 11:00:00", "view", 1L, 3.0)))
  }
}
