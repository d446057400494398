package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import graft.GraftSession
import graft.operators.Layout
import graft.sources.{AtomicWarehouse, ColEq, ColGe, ColLt}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Measures what manifest-level data skipping buys over the parquet reader's
  * own row-group pruning, at growing corpus scale. The honest framing: with
  * pushed filters, row-group min/max already bounds RECORDS read in both
  * modes — what manifest stats remove is the per-file cost that dominates a
  * 100 TB table with millions of files: listing, footer reads, and one task
  * per file for files the driver can prove empty of matches. So the probe
  * reports files opened and TASKS LAUNCHED alongside bytes/records, and
  * asserts result identity (probed ≡ full) on every phase.
  *
  * Phases per scale multiple:
  *   scan    — one-band range predicate: scanWhere vs read+filter
  *   count   — metadata-assisted COUNT over a band-spanning range vs a full
  *             scan count (fully-included files never read)
  *   zorder  — compactWith(zorderAuto) re-layout, then a 2-D rectangle
  *             predicate: file-level stats prune on BOTH dimensions
  *   delete  — copy-on-write deleteWhere: fraction of files/bytes rewritten
  *
  * Emits one JSON line per (phase, mult) to stdout AND target/skipprobe.json.
  */
object SkipProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mults = args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 4, 16))
    val spark = GraftSession.builder().appName("skip-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bytesRead = new AtomicLong(); val recordsRead = new AtomicLong()
    val tasks = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val im = t.taskMetrics.inputMetrics
        bytesRead.addAndGet(im.bytesRead); recordsRead.addAndGet(im.recordsRead)
        tasks.incrementAndGet()
      }
    })
    def measured[T](f: => T): (T, Long, Long, Long, Double) = {
      // listener events are async; a short settle on both sides keeps a
      // previous phase's stragglers out of this phase's counters (the
      // ZOrderProbe convention — listenerBus is private to spark)
      Thread.sleep(300)
      bytesRead.set(0); recordsRead.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      (r, bytesRead.get, recordsRead.get, tasks.get, wall)
    }

    val out = new java.io.PrintWriter(new java.io.FileWriter("target/skipprobe.json"))
    def emit(line: String): Unit = { println(line); out.println(line); out.flush() }

    val sch = StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("ck", LongType, nullable = false),
      StructField("cents", LongType, nullable = false)))
    val ordersBase = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"))
    val baseMax = ordersBase.agg(max(col("k"))).head().getLong(0) + 1

    mults.foreach { mult =>
      val corpus = (0 until mult).map(i => ordersBase
        .select((col("k") + lit(i * baseMax)).as("k"), col("ck"), col("cents")))
        .reduce(_ union _)
      val span = baseMax * mult
      val nBands = 16
      val root = Files.createTempDirectory(s"graft-skipprobe-x$mult-").toString
      val wh = new AtomicWarehouse(spark, root)
      (0 until nBands).foreach { b =>
        val lo = span * b / nBands; val hi = span * (b + 1) / nBands
        wh.append("t", corpus.filter(col("k") >= lo && col("k") < hi).coalesce(1))
      }
      def agg2(df: DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), coalesce(sum(col("cents")), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      }

      // ---- scan: one band's range ----
      locally {
        val lo = span * 5 / nBands; val hi = span * 6 / nBands
        val preds = Seq(ColGe("k", lo), ColLt("k", hi))
        val (kept, skipped) = wh.planFiles("t", preds)
        val (pRes, pB, pR, pT, pW) = measured(agg2(wh.scanWhere("t", sch, preds)))
        val (fRes, fB, fR, fT, fW) = measured(
          agg2(wh.read("t", sch).filter(col("k") >= lo && col("k") < hi)))
        require(pRes == fRes, s"scanWhere != full filter at x$mult: $pRes vs $fRes")
        emit(s"""{"probe":"skip","phase":"scan","mult":$mult,"files_total":${kept.size + skipped.size},""" +
          s""""files_kept":${kept.size},"rows":${pRes._1},"probed":{"bytes":$pB,"records":$pR,"tasks":$pT,"wall_s":${f"$pW%.3f"}},""" +
          s""""full":{"bytes":$fB,"records":$fR,"tasks":$fT,"wall_s":${f"$fW%.3f"}}}""")
      }

      // ---- bloom: point lookup on a HASH-banded copy — every file's
      // [min,max] spans the whole key domain, so bounds prune nothing and
      // only the per-file Bloom sidecars can route. Reports the sidecar
      // byte cost next to the table bytes (the ~0.1%-of-data budget) and
      // the lookup's files/tasks vs the bloom-blind full scan ----
      locally {
        val rootB = Files.createTempDirectory(s"graft-skipprobe-bloom-x$mult-").toString
        val whB = new AtomicWarehouse(spark, rootB)
        whB.setBloomIndex("t", Seq("k"), fpp = 0.001)
        (0 until nBands).foreach(b =>
          whB.append("t", corpus.filter(col("k") % nBands === b).coalesce(1)))
        val idxBytes = whB.sizeBytes("t/_bloom")
        val dataBytes = whB.sizeBytes("t") // visible data files only (not the index)
        // a real key (corpus keys have gaps): the largest of residue class 3
        val probeKey = corpus.filter(col("k") % nBands === 3)
          .agg(max(col("k"))).head().getLong(0)
        val preds = Seq(ColEq("k", probeKey))
        val (kept, skipped) = whB.planFiles("t", preds)
        val (pRes, pB, pR, pT, pW) = measured(agg2(whB.scanWhere("t", sch, preds)))
        val (fRes, fB, fR, fT, fW) = measured(
          agg2(whB.read("t", sch).filter(col("k") === probeKey)))
        require(pRes == fRes, s"bloom scanWhere != full filter at x$mult: $pRes vs $fRes")
        emit(s"""{"probe":"skip","phase":"bloom","mult":$mult,"files_total":${kept.size + skipped.size},""" +
          s""""files_kept":${kept.size},"rows":${pRes._1},"index_bytes":$idxBytes,"data_bytes":$dataBytes,""" +
          s""""probed":{"bytes":$pB,"records":$pR,"tasks":$pT,"wall_s":${f"$pW%.3f"}},""" +
          s""""full":{"bytes":$fB,"records":$fR,"tasks":$fT,"wall_s":${f"$fW%.3f"}}}""")
      }

      // ---- count: bands 4..12 — middles answered from metadata ----
      locally {
        val lo = span * 7 / (2 * nBands) // straddles band 3/4 boundary
        val hi = span * 12 / nBands
        val preds = Seq(ColGe("k", lo), ColLt("k", hi))
        val (cRes, _, cR, cT, cW) = measured(wh.countWhere("t", sch, preds))
        val (fRes, _, fR, fT, fW) = measured(
          wh.read("t", sch).filter(col("k") >= lo && col("k") < hi).count())
        require(cRes.count == fRes, s"countWhere != full count at x$mult: $cRes vs $fRes")
        emit(s"""{"probe":"skip","phase":"count","mult":$mult,"rows":${cRes.count},""" +
          s""""files_meta":${cRes.filesMetadata},"files_read":${cRes.filesRead},"files_skipped":${cRes.filesSkipped},""" +
          s""""probed":{"records":$cR,"tasks":$cT,"wall_s":${f"$cW%.3f"}},"full":{"records":$fR,"tasks":$fT,"wall_s":${f"$fW%.3f"}}}""")
      }

      // ---- zorder: 2-D rectangle after a stats-refreshing re-layout ----
      locally {
        wh.compactWith("t", sch, df => Layout.zorderAuto(df, "ck", "k", numFiles = nBands))
        val ckMax = ordersBase.agg(max(col("ck"))).head().getLong(0) + 1
        val preds = Seq(ColGe("ck", ckMax / 4), ColLt("ck", ckMax * 3 / 8),
          ColGe("k", span / 4), ColLt("k", span * 3 / 8))
        val (kept, skipped) = wh.planFiles("t", preds)
        val cond = col("ck") >= ckMax / 4 && col("ck") < ckMax * 3 / 8 &&
          col("k") >= span / 4 && col("k") < span * 3 / 8
        val (pRes, pB, pR, pT, pW) = measured(agg2(wh.scanWhere("t", sch, preds)))
        val (fRes, fB, fR, fT, fW) = measured(agg2(wh.read("t", sch).filter(cond)))
        require(pRes == fRes, s"zorder scanWhere != full at x$mult: $pRes vs $fRes")
        emit(s"""{"probe":"skip","phase":"zorder2d","mult":$mult,"files_total":${kept.size + skipped.size},""" +
          s""""files_kept":${kept.size},"rows":${pRes._1},"probed":{"bytes":$pB,"records":$pR,"tasks":$pT,"wall_s":${f"$pW%.3f"}},""" +
          s""""full":{"bytes":$fB,"records":$fR,"tasks":$fT,"wall_s":${f"$fW%.3f"}}}""")
      }

      // ---- recluster: interleaved ingest kills skipping; maintenance
      // restores it (the liquid-clustering story at its smallest) ----
      locally {
        val root3 = Files.createTempDirectory(s"graft-skipprobe-rc-x$mult-").toString
        val wh3 = new AtomicWarehouse(spark, root3)
        (0 until nBands).foreach(b =>
          wh3.append("t", corpus.filter(col("k") % nBands === b).coalesce(1)))
        val lo = span * 5 / nBands; val hi = span * 6 / nBands
        val preds = Seq(ColGe("k", lo), ColLt("k", hi))
        val (kb, _) = wh3.planFiles("t", preds)
        val (bRes, _, bR, bT, bW) = measured(agg2(wh3.scanWhere("t", sch, preds)))
        val (_, _, _, _, rcW) = measured(wh3.recluster("t", sch, Seq("k"), nBands))
        val (ka, _) = wh3.planFiles("t", preds)
        val (aRes, _, aR, aT, aW) = measured(agg2(wh3.scanWhere("t", sch, preds)))
        require(aRes == bRes, s"recluster changed the scan result at x$mult: $aRes vs $bRes")
        emit(s"""{"probe":"skip","phase":"recluster","mult":$mult,"files_total":$nBands,""" +
          s""""kept_before":${kb.size},"kept_after":${ka.size},"rows":${aRes._1},"recluster_wall_s":${f"$rcW%.3f"},""" +
          s""""before":{"records":$bR,"tasks":$bT,"wall_s":${f"$bW%.3f"}},"after":{"records":$aR,"tasks":$aT,"wall_s":${f"$aW%.3f"}}}""")
      }

      // ---- incremental recluster: a banded table eroded by scattered
      // intruder files; the tail-only pass restores band pruning while
      // rewriting ONLY the intruders' bytes — vs the global recluster
      // above, which rewrites the whole table every time ----
      locally {
        val root4 = Files.createTempDirectory(s"graft-skipprobe-rci-x$mult-").toString
        val wh4 = new AtomicWarehouse(spark, root4)
        (0 until nBands).foreach { b =>
          val lo = span * b / nBands; val hi = span * (b + 1) / nBands
          wh4.append("t", corpus.filter(col("k") >= lo && col("k") < hi).coalesce(1))
        }
        // 6 intruders, each a full-range scatter (~6/7ths of a band's rows)
        (2 to 7).foreach(s7 =>
          wh4.append("t", corpus.filter(col("k") % (s7 * nBands) === 0).coalesce(1)))
        val totalBytes = wh4.sizeBytes("t")
        val lo = span * 5 / nBands; val hi = span * 6 / nBands
        val preds = Seq(ColGe("k", lo), ColLt("k", hi))
        val (kb, _) = wh4.planFiles("t", preds)
        val (bRes, _, _, bT, bW) = measured(agg2(wh4.scanWhere("t", sch, preds)))
        val (rci, _, _, _, rciW) = measured(
          wh4.reclusterIncremental("t", sch, Seq("k"), maxOverlap = 6, outFiles = 6))
        val (ka, _) = wh4.planFiles("t", preds)
        val (aRes, _, _, aT, aW) = measured(agg2(wh4.scanWhere("t", sch, preds)))
        require(aRes == bRes,
          s"reclusterIncremental changed the scan result at x$mult: $aRes vs $bRes")
        emit(s"""{"probe":"skip","phase":"recluster_incremental","mult":$mult,""" +
          s""""files_total":${nBands + 6},"files_rewritten":${rci.filesRewritten},""" +
          s""""files_untouched":${rci.filesUntouched},"bytes_rewritten":${rci.bytesRewritten},""" +
          s""""bytes_total":$totalBytes,"kept_before":${kb.size},"kept_after":${ka.size},""" +
          s""""rows":${aRes._1},"recluster_wall_s":${f"$rciW%.3f"},""" +
          s""""before":{"tasks":$bT,"wall_s":${f"$bW%.3f"}},"after":{"tasks":$aT,"wall_s":${f"$aW%.3f"}}}""")
      }

      // ---- delete: rewrite fraction on a fresh banded copy ----
      locally {
        val root2 = Files.createTempDirectory(s"graft-skipprobe-del-x$mult-").toString
        val wh2 = new AtomicWarehouse(spark, root2)
        (0 until nBands).foreach { b =>
          val lo = span * b / nBands; val hi = span * (b + 1) / nBands
          wh2.append("t", corpus.filter(col("k") >= lo && col("k") < hi).coalesce(1))
        }
        val totalBytes = wh2.sizeBytes("t")
        val lo = span * 9 / nBands; val hi = span * 10 / nBands
        val (cands, _) = wh2.planFiles("t", Seq(ColGe("k", lo), ColLt("k", hi)))
        val (deleted, _, _, _, dW) = measured(
          wh2.deleteWhere("t", sch, Seq(ColGe("k", lo), ColLt("k", hi))))
        emit(s"""{"probe":"skip","phase":"delete","mult":$mult,"files_total":$nBands,""" +
          s""""files_rewritten":${cands.size},"bytes_total":$totalBytes,"deleted_rows":$deleted,"wall_s":${f"$dW%.3f"}}""")
      }
    }
    out.close()
    spark.stop()
  }
}
