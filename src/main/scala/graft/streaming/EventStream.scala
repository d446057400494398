package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

/** Watermarked event-time tumbling-window aggregation over a file stream —
  * the streaming twin of the batch `q10_events_hourly` query, proving the
  * same Column expressions serve batch and stream unchanged (SURVEY §2.8).
  *
  * Batch-equivalence contract (what the `q10_stream` oracle checks): in
  * complete output mode the final emit after an `AvailableNow` drain is the
  * aggregate over every row ingested, so with a watermark delay exceeding
  * the fixture's event-time span (no row ever late) the result equals the
  * batch aggregation EXACTLY, for any file batching. The short-delay
  * behavior — late rows dropped once the watermark passes — is proven by
  * StreamingAggSpec, which is where eviction semantics are observable.
  *
  * Scale shape: state is one row per (window, event_type) — bounded by time
  * span × type cardinality, not input rows; sums accumulate in exact
  * DECIMAL so the emitted totals are independent of row arrival order.
  * `countDistinct` is deliberately absent: streaming aggregation forbids
  * exact distinct (unbounded per-group state); the production path is
  * `approx_count_distinct`, which no exact oracle can match.
  */
object EventStream {

  /** Run the hourly aggregation stream over parquet files in `inDir` until
    * drained; returns the finished result (hour, event_type, n_events,
    * total_value).
    */
  def hourlyAgg(spark0: SparkSession, inDir: String, name: String,
      watermarkDelay: String = "3650 days", statePartitions: Int = 8): DataFrame = {
    // isolated conf: state partition count is frozen into the checkpoint at
    // start, so size it to the per-batch volume (GraftSession.streamSession)
    val spark = graft.GraftSession.streamSession(spark0, statePartitions)
    spark.catalog.dropTempView(name) // re-runs in one session reuse the name
    val schema = spark.read.parquet(inDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .withColumn("tsm", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("tsm", watermarkDelay)
      .groupBy(window(col("tsm"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).as("total_dec"))
      .writeStream.format("memory").queryName(name).outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    // a false return means the stream has NOT drained: the table would hold
    // a partial aggregate that surfaces as an inscrutable oracle mismatch —
    // fail loudly instead
    val drainMs = graft.GraftSession.streamDrainTimeoutMs
    if (!q.awaitTermination(drainMs)) {
      q.stop()
      throw new IllegalStateException(s"stream $name failed to drain within ${drainMs / 1000} s")
    }
    spark.table(name).select(
      date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
      col("event_type"),
      col("n_events"),
      round(col("total_dec").cast("double"), 2).as("total_value"))
  }
}
