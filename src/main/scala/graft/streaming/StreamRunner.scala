package graft.streaming

import graft.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** §2.8 — the reference's blob-trigger micro-batching as Structured
  * Streaming: a file source watches a container path; each discovered file
  * runs the EP1 pipeline with its own ledger lifecycle, preserving the
  * reference's per-file idempotency semantics (the Spark checkpoint gives
  * at-most-once file discovery; the ledger stays the *queryable* record,
  * exactly like ProcessFile).
  *
  * Files are processed individually (split by `input_file_name`) because the
  * ledger is keyed per file — matching one-blob-per-invocation in
  * function_app.py:119-153. File counts per trigger are small; the per-file
  * work itself is distributed.
  */
class StreamRunner(pipeline: Pipeline, schemaHint: Option[StructType] = None) {

  private def inferredSchema(dir: String): StructType =
    schemaHint.getOrElse {
      // pre-check for files instead of catching AnalysisException broadly —
      // a typo'd path or permission error must fail fast, not silently fall
      // back and mis-parse later arrivals
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(pipeline.spark.sparkContext.hadoopConfiguration)
      val hasCsv = fs.exists(p) &&
        fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/*.csv")).nonEmpty
      if (hasCsv)
        pipeline.spark.read.option("header", "true").option("inferSchema", "false")
          .csv(s"$dir/*.csv").schema
      else if (fs.exists(p))
        // empty container at start-up (the normal deployment shape): start
        // with the canonical Spanish price-list headers; pass schemaHint for
        // containers with a different layout
        StructType(graft.model.Schemas.requiredHeaders.map(h => StructField(h, StringType)))
      else
        throw new IllegalArgumentException(s"stream directory does not exist: $dir")
    }

  /** Start watching `dir` for CSV files. `Trigger.AvailableNow` drains
    * pending files then stops — use for tests/batch catch-up; pass
    * `Trigger.ProcessingTime(...)` for continuous watching.
    */
  def start(dir: String, container: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val stream = pipeline.spark.readStream
      .schema(inferredSchema(dir))
      .option("header", "true")
      .option("maxFilesPerTrigger", "16")
      .csv(dir)

    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val withFile = batch.withColumn("__file", input_file_name())
        val files = withFile.select(col("__file")).distinct().collect().map(_.getString(0))
        files.sorted.foreach { f =>
          val name = new org.apache.hadoop.fs.Path(f).getName
          val fileDf = withFile.filter(col("__file") === f).drop("__file")
          pipeline.processCsv(fileDf, container, name)
        }
        ()
      }
      .start()
  }
}
