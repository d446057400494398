package graft.tools

import java.nio.file.Files

import graft.GraftSession
import graft.sources.AtomicWarehouse
import graft.streaming.DedupStream
import org.apache.spark.sql.functions._

/** Always-on-stream soak for the transactional dedup path: drive DedupStream
  * on an [[AtomicWarehouse]] through N micro-batches (default 50) with inline
  * maintenance ON (compaction + vacuum every `compactEvery`, commit
  * auto-fold), and measure what an always-on deployment cares about — that
  * PER-BATCH cost stays flat as the accumulated corpus, manifest log, and
  * file population grow:
  *
  *   - wall seconds per batch (probe cost must track the batch, not the
  *     corpus; maintenance passes show up as periodic spikes, not a trend)
  *   - manifest files read per batch (the fold cache + auto-fold bound)
  *   - live manifest count and warehouse parquet-file count (the two
  *     unbounded-growth failure modes this exists to rule out)
  *
  * Batches are id-ordered slices of the sf dir's documents — the same data
  * shape as the `dedup_stream` driver query, ~50× longer. Emits one JSON
  * line per batch to stdout AND target/streamsoak.json, then a summary line
  * comparing early vs late per-batch medians (the BASELINE.md artifact).
  */
object StreamSoak {
  private def median(ts: Seq[Double]): Double = {
    val s = ts.sorted
    if (s.isEmpty) 0 else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 50
    val compactEvery = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.builder().appName("stream-soak").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val whDir = Files.createTempDirectory("graft-soak-wh-").toString
    // soak-scaled vacuum grace: a deployment running for days uses the 1 h
    // default; a minutes-long soak needs a grace that actually expires to
    // show garbage being COLLECTED, not merely deferred
    val wh = new AtomicWarehouse(spark, whDir, vacuumGraceMs = 15000)
    val ds = new DedupStream(wh, minJaccard = 0.35, minSigMatchesOverride = 4,
      compactEvery = compactEvery, probeMinIndexBytes = 1024)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val per = (maxId + nBatches) / nBatches

    def parquetFiles(): Long = {
      val s = Files.walk(java.nio.file.Paths.get(whDir))
      try s.filter(_.toString.endsWith(".parquet")).count() finally s.close()
    }
    def manifests(): Long = {
      val log = java.nio.file.Paths.get(whDir, "_txlog")
      if (!Files.isDirectory(log)) 0
      else {
        val s = Files.list(log)
        try s.filter(_.getFileName.toString.matches("v\\d{8}\\.tsv")).count()
        finally s.close()
      }
    }

    val out = new StringBuilder
    def emit(line: String): Unit = { println(line); out.append(line).append('\n') }

    val wall = (0 until nBatches).map { i =>
      val batch = docs.filter(col("doc_id") >= i * per && col("doc_id") < (i + 1) * per)
      val mr0 = wh.manifestReads.get()
      val t0 = System.nanoTime()
      ds.processBatch(batch) // the exact path foreachBatch drives
      val sec = (System.nanoTime() - t0) / 1e9
      val visible = Seq(ds.indexTable, ds.bandTable, ds.corpusTable, ds.pairsTable)
        .map(t => wh.visibleFileCount(t).max(0)).sum
      emit(f"""{"tool":"streamsoak","batch":$i,"sec":$sec%.2f,"manifest_reads":${wh.manifestReads.get() - mr0},"manifests":${manifests()},"visible_files":$visible,"parquet_files":${parquetFiles()}}""")
      sec
    }
    val early = median(wall.slice(5, 15))
    val late = median(wall.slice(nBatches - 10, nBatches))
    val pairs = ds.pairs().count()
    val finalVisible = Seq(ds.indexTable, ds.bandTable, ds.corpusTable, ds.pairsTable)
      .map(t => wh.visibleFileCount(t).max(0)).sum
    emit(f"""{"tool":"streamsoak","summary":true,"sf":"$sfDir","batches":$nBatches,"compact_every":$compactEvery,"early_median_sec":$early%.2f,"late_median_sec":$late%.2f,"late_over_early":${late / early}%.2f,"final_manifests":${manifests()},"final_visible_files":$finalVisible,"final_parquet_files":${parquetFiles()},"pairs":$pairs}""")

    val p = java.nio.file.Paths.get("target/streamsoak.json")
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, out.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
