package graft.tools

import graft.GraftSession
import graft.operators.Corpus
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Scale evidence for [[Corpus.packShards]]' two-pass distributed prefix
  * sum on the shape that kills the naive per-key window: a corpus that is
  * ~90% ONE pack key (real pretraining mixes are about half English). The
  * probe packs that corpus at ×1/×4/×16 and records, for BOTH
  * implementations, the largest single task's shuffle-read row count during
  * the shard assignment — the naive `Window.partitionBy(lang)` funnels the
  * dominant key through one sorted reducer (peak grows linearly with the
  * corpus, unsplittable: AQE can merge partitions but never split a key),
  * while the distributed form's peak is bounded by the RANGE block size
  * regardless of how the keys skew.
  *
  * Scale emulation (the ScaleProbe precedent of re-shaping a toy corpus to
  * the at-scale regime): block count scales with the corpus (what
  * shuffle-partition sizing does on a real cluster), and AQE post-shuffle
  * COALESCING is disabled for the probe — at probe scale every partition
  * sits under any realistic advisory byte target, so coalescing merges all
  * of them into one task for BOTH implementations and the measurement
  * reads the coalescer, not the skew property. At 100 TB coalescing is
  * byte-bounded and cannot merge past its target; what it can never do is
  * SPLIT the naive window's dominant-key partition — which is exactly the
  * per-partition (= per-task, once coalescing is out of the frame) row
  * count this probe records.
  *
  * Output: one JSON line per (scale, impl) to stdout and
  * target/shardprobe.json. Read peak rows, not wall: at probe scale the
  * distributed form's extra stages cost more wall than they save (tiny
  * data, fixed per-stage overhead) — the naive window's failure mode is
  * the LINEARLY-GROWING single sorted task, which wall at 80 k rows
  * cannot show but peak-task rows does.
  */
object ShardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(1, 4, 16)
    val spark = GraftSession.builder().appName("shard-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    val peakTaskRecords = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val rec = t.taskMetrics.shuffleReadMetrics.recordsRead
        var cur = peakTaskRecords.get()
        while (rec > cur && !peakTaskRecords.compareAndSet(cur, rec))
          cur = peakTaskRecords.get()
      }
    })

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

    // 90%-one-key mix: doc_id % 10 != 0 → "en", the rest spread over 7 tail
    // languages (so the probe also exercises many small groups sharing
    // blocks with the giant one)
    def corpus(n: Int): DataFrame =
      (0 until n).map { i =>
        docs0.select((col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
          col("text"))
      }.reduce(_ union _)
        .withColumn("lang", when(pmod(col("doc_id"), lit(10)) =!= 0, lit("en"))
          .otherwise(concat(lit("l"), pmod(col("doc_id"), lit(7)))))

    val out = new StringBuilder
    def emit(line: String): Unit = { println(line); out.append(line).append('\n') }

    scales.foreach { n =>
      val c = corpus(n).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rows = c.count()
      // block count scales with data, as shuffle-partition sizing would on
      // a cluster (fixed blocks at growing data measures block growth, not
      // the algorithm)
      spark.conf.set("spark.sql.shuffle.partitions", (32 * n).toString)
      // both impls are packShards itself with the fast-path threshold forced
      // (0 ⇒ always distributed, MaxValue ⇒ always the naive window), so the
      // probe measures exactly the code paths the auto-select dispatches to —
      // including the shared planning/validation aggregate
      for ((impl, fn) <- Seq(
          "distributed" -> ((d: DataFrame) =>
            Corpus.packShards(d, "doc_id", "text", col("lang"), 2000L,
              smallInputRows = 0L)),
          "naive_window" -> ((d: DataFrame) =>
            Corpus.packShards(d, "doc_id", "text", col("lang"), 2000L,
              smallInputRows = Long.MaxValue)))) {
        peakTaskRecords.set(0)
        val t0 = System.nanoTime()
        val shards = fn(c).agg(countDistinct(col("lang"), col("shard"))).head().getLong(0)
        val wall = (System.nanoTime() - t0) / 1e9
        emit(s"""{"scale":$n,"impl":"$impl","rows":$rows,"shards":$shards,""" +
          s""""peak_task_shuffle_records":${peakTaskRecords.get()},""" +
          s""""wall_s":${math.round(wall * 1000) / 1000.0}}""")
      }
      c.unpersist()
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.write(java.nio.file.Paths.get("target/shardprobe.json"),
      out.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
