package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermarked STREAM-STREAM joins — the missing half of the engine's
  * streaming surface (stream-static enrichment rides the warehouse source;
  * this is two live streams joined on key + event-time proximity, the
  * click↔impression attribution shape).
  *
  * Spark-first: the plan is a plain `join` whose condition carries BOTH the
  * key equality and the time-range bound; Structured Streaming derives the
  * state-eviction policy from the range condition and the two watermarks
  * (`StreamingSymmetricHashJoinExec`). Each side buffers only rows inside
  * its watermark horizon — state is bounded by (arrival skew × rate), never
  * by stream length, which is what makes the operator run forever at
  * 100 TB/day rates. The shuffle partitions on the join keys, so a
  * 1000-executor cluster fans the state horizontally; skewed keys ride the
  * same salting guidance as the batch joins (SURVEY §6).
  *
  * Semantics (mirrors [[graft.operators.TimeJoins.intervalJoin]], the batch
  * twin — `q20_interval_join`'s oracle restates both): left row at time t
  * matches right row at time s when keys are equal and t ∈ [s, s + maxLag).
  * Inner joins drop late rows past the watermark (their match state is
  * gone); left_outer additionally emits unmatched left rows once the
  * watermark proves no match can arrive. That is exactly Spark's contract —
  * the operator adds no private state machinery on top.
  */
object StreamJoins {

  /** The joined streaming plan. `left`/`right` must carry DISTINCT column
    * names apart from `keyCols` (rename upstream — the output keeps the
    * left copy of each key). `maxLag` is a SQL interval string
    * (`"45 minutes"`); `leftDelay`/`rightDelay` are the two watermark
    * delays — the correctness/ state-size dial: a delay of years keeps
    * every row joinable (exact replay), a delay of minutes bounds state to
    * minutes of traffic and drops later stragglers.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, maxLag: String,
      leftDelay: String, rightDelay: String,
      joinType: String = "inner"): DataFrame = {
    require(keyCols.nonEmpty, "intervalJoin requires at least one key column")
    val overlap = (left.columns.toSet -- keyCols)
      .intersect(right.columns.toSet -- keyCols)
    require(overlap.isEmpty,
      s"non-key columns must be distinct across sides, both have: $overlap")
    val l = left.withWatermark(leftTs, leftDelay).alias("l")
    val r = right.withWatermark(rightTs, rightDelay).alias("r")
    val keyCond = keyCols.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val range = col(s"l.$leftTs") >= col(s"r.$rightTs") &&
      col(s"l.$leftTs") < col(s"r.$rightTs") + expr(s"INTERVAL $maxLag")
    val outCols =
      keyCols.map(k => col(s"l.$k").as(k)) ++
        left.columns.toSeq.filterNot(keyCols.contains).map(c => col(s"l.$c").as(c)) ++
        right.columns.toSeq.filterNot(keyCols.contains).map(c => col(s"r.$c").as(c))
    l.join(r, keyCond && range, joinType).select(outCols: _*)
  }

  /** Drain a streaming plan to a memory sink until AvailableNow exhausts
    * both sides; returns the accumulated appends. Append mode is the only
    * mode stream-stream joins support (each match emits exactly once).
    */
  def drain(joined: DataFrame, name: String): DataFrame = {
    val spark = joined.sparkSession
    spark.catalog.dropTempView(name) // re-runs in one session reuse the name
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val drainMs = graft.GraftSession.streamDrainTimeoutMs
    if (!q.awaitTermination(drainMs)) {
      q.stop()
      throw new IllegalStateException(
        s"stream $name failed to drain within ${drainMs / 1000} s")
    }
    spark.table(name)
  }

  /** File-source convenience: both sides stream from parquet chunk dirs
    * (one file per micro-batch — the repo's deterministic replay fixture),
    * joined and drained. `statePartitions` sizes the join-state shuffle;
    * it is frozen into the checkpoint at stream start.
    */
  def fileIntervalJoin(spark0: SparkSession, leftDir: String, rightDir: String,
      keyCols: Seq[String], leftTs: String, rightTs: String, maxLag: String,
      leftDelay: String, rightDelay: String, name: String,
      joinType: String = "inner", statePartitions: Int = 8): DataFrame = {
    val spark = graft.GraftSession.streamSession(spark0, statePartitions)
    def side(dir: String) = {
      val schema = spark.read.parquet(dir).schema
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)
    }
    drain(intervalJoin(side(leftDir), side(rightDir), keyCols,
      leftTs, rightTs, maxLag, leftDelay, rightDelay, joinType), name)
  }
}
