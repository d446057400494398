package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming beyond the reference's parity surface: watermarked
  * event-time windowed aggregation (the shape q10 runs as a batch query),
  * proving the same column expressions serve batch and streaming unchanged.
  */
class StreamingAggSpec extends SparkSpec {
  import spark.implicits._

  test("watermark + tumbling window aggregation over a file stream") {
    val dir = Files.createTempDirectory("graft-stream-ev-").toString

    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:10"), "click", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 10:02:30"), "click", 2.0),
      (3L, Timestamp.valueOf("2024-01-01 10:02:40"), "view", 3.0),
      (4L, Timestamp.valueOf("2024-01-01 10:07:05"), "click", 4.0),
      (5L, Timestamp.valueOf("2024-01-01 09:55:00"), "view", 5.0)) // late
      .toDF("event_id", "ts", "event_type", "value")
    events.coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(events.schema).parquet(dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))

    val q = stream.writeStream
      .format("memory").queryName("agg_out").outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream failed to drain within 120 s")

    val out = spark.sql(
      "SELECT date_format(window.start,'HH:mm') s, event_type, n, total FROM agg_out ORDER BY s, event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    assert(out.toSeq == Seq(
      ("09:55", "view", 1L, 5.0),
      ("10:00", "click", 2L, 3.0),
      ("10:00", "view", 1L, 3.0),
      ("10:05", "click", 1L, 4.0)))
  }

  test("stateful dedup stream: dropDuplicates within watermark") {
    val dir = Files.createTempDirectory("graft-stream-dd-").toString
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      (1L, Timestamp.valueOf("2024-01-01 10:00:30"), "a"), // dup id
      (2L, Timestamp.valueOf("2024-01-01 10:01:00"), "b"))
      .toDF("id", "ts", "payload")
      .coalesce(1).write.mode("overwrite").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val q = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("id")
      .writeStream.format("memory").queryName("dd_out").outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream failed to drain within 120 s")

    assert(spark.sql("SELECT count(*) FROM dd_out").head().getLong(0) == 2)
  }
}
