package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** One-off plan probe for the DedupStream per-batch pairs computation: builds
  * the exact incremental plan processBatch hands to the pairs append (batch 3
  * against a 2/3-full persisted index) and prints explain("formatted") plus
  * the job count of executing it once — the measured shape behind the
  * dedup_stream optimization work.
  */
object BatchPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().appName("batch-plan-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ss = GraftSession.streamSession(spark)
    val wh = new graft.sources.AtomicWarehouse(ss,
      java.nio.file.Files.createTempDirectory("graft-bpp-").toString)
    val ds = new graft.streaming.DedupStream(wh,
      minJaccard = 0.35, minSigMatchesOverride = 4)
    val docs = ss.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
    // admit batches 0 and 1 the way the stream does
    (0 until 2).foreach { i =>
      ds.processBatch(docs.filter(pmod(col("doc_id"), lit(3)) === i))
    }
    // batch 2's pairs plan, exactly as processBatch builds it
    val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batchSigs = Dedup.minhashSignatures(batch, "doc_id", "text", 5, 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup.incrementalLshVerifiedPairs(
      wh.read(ds.corpusTable, ds.docSchema), wh.read(ds.indexTable, ds.sigSchema), batch,
      "doc_id", "text", 5, 8, 2, 0.35, 4, freshSigsPre = Some(batchSigs),
      persistCorpusSigs = false,
      corpusBandsPre = Some(wh.read(ds.bandTable, ds.bandSchema)),
      probeKeyLimit = 0, pointLookupMaxIds = 0, bandBloom = None,
      corpusBandsCarrySigs = true)
    println("=== pairs plan (before execution) ===")
    println(pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    val n = new java.util.concurrent.atomic.AtomicInteger()
    val t0s = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        n.incrementAndGet()
        // the final stage's call site names the action; the stage list's
        // sizes say how much of the plan this job materialized
        val site = j.stageInfos.lastOption.map(_.name.take(70)).getOrElse("?")
        t0s.put(j.jobId, (System.nanoTime(),
          s"$site (${j.stageInfos.size} stages, ${j.stageInfos.map(_.numTasks).sum} tasks)"))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(t0s.remove(e.jobId)).foreach { case (t0, site) =>
          println(f"  [job ${e.jobId}] ${(System.nanoTime() - t0) / 1e6}%.0f ms  $site") }
    })
    def timed(label: String)(f: => Unit): Unit = {
      val j0 = n.get; val t0 = System.nanoTime(); f
      println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, jobs=${n.get - j0} ===")
    }
    // sub-plan timings: candidate generation alone, then the full pipeline
    // (the second run reuses any cache the first materialized, so run full
    // FIRST on a fresh plan, then the pieces)
    timed("full pairs")(pairs.write.format("noop").mode("overwrite").save())
    timed("full pairs again")(pairs.write.format("noop").mode("overwrite").save())
    // fresh warehouse state unchanged; rebuild the plan to drop cand cache
    val pairs2 = Dedup.incrementalLshVerifiedPairs(
      wh.read(ds.corpusTable, ds.docSchema), wh.read(ds.indexTable, ds.sigSchema), batch,
      "doc_id", "text", 5, 8, 2, 0.35, 4, freshSigsPre = Some(batchSigs),
      persistCorpusSigs = false,
      corpusBandsPre = Some(wh.read(ds.bandTable, ds.bandSchema)),
      probeKeyLimit = 0, pointLookupMaxIds = 0, bandBloom = None,
      corpusBandsCarrySigs = true)
    timed("full pairs fresh plan")(pairs2.write.format("noop").mode("overwrite").save())
    // volumes behind the per-batch cost: band collisions, prefilter
    // survivors, verified pairs
    val freshBands = Dedup.bandKeys(batchSigs, "doc_id", 8, 2, carrySigs = true)
    val corpusBands = wh.read(ds.bandTable, ds.bandSchema)
    val cand0 = corpusBands.union(freshBands).alias("a")
      .join(freshBands.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id_b"))
      .distinct()
    println(s"=== cand0 (band collisions): ${cand0.count()} ===")
    println(s"=== verified pairs: ${pairs2.count()} ===")
    spark.stop()
  }
}
