package graft.tools

import java.nio.file.Files

import graft.GraftSession
import graft.sources.AtomicWarehouse
import graft.streaming.ApplyChangesStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Soak for the CDC-apply path: does per-batch cost track the CHANGES (and
  * the band files they touch), or the table? A consumer of a database change
  * feed runs this loop forever against a table that only grows, so the
  * difference decides whether the operator survives at 100 TB.
  *
  * Shape: a banded target table at each corpus multiple (16 range-clustered
  * files), then `batches` change batches of fixed size applied through
  * [[ApplyChangesStream.applyChanges]] — each batch updates keys inside ONE
  * rotating band, deletes a few, inserts a few beyond the range. Reported
  * per corpus multiple: first/last-5-batch mean wall (late/early drift — the
  * table grows by the inserts, the manifest by one commit per batch),
  * files rewritten per batch (must stay ~1-2: the touched band + the
  * insert tail), and the end-state row count reconciled against an
  * independently computed expectation (the soak is also a correctness run).
  *
  * One JSON line per corpus multiple → stdout + target/cdcsoak.json.
  */
object CdcSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mults = args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 4))
    val batches = args.drop(2).headOption.map(_.toInt).getOrElse(50)
    val spark = GraftSession.builder().appName("cdc-soak").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val out = new java.io.PrintWriter(new java.io.FileWriter("target/cdcsoak.json"))
    def emit(line: String): Unit = { println(line); out.println(line); out.flush() }

    val base = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val ordersBase = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("v"))
    val baseMax = ordersBase.agg(max(col("k"))).head().getLong(0) + 1

    mults.foreach { mult =>
      val corpus = (0 until mult).map(i => ordersBase
        .select((col("k") + lit(i * baseMax)).as("k"), col("v")))
        .reduce(_ union _)
      val span = baseMax * mult
      val nBands = 16
      val wh = new AtomicWarehouse(spark,
        Files.createTempDirectory(s"graft-cdcsoak-x$mult-").toString)
      wh.appendClustered("t", corpus, Seq("k"), nBands)
      val startRows = wh.read("t", base).count()
      val acs = new ApplyChangesStream(wh, "t", Seq("k"), base)

      val walls = new Array[Double](batches)
      var rewrittenTotal = 0L
      var inserted = 0L
      (0 until batches).foreach { b =>
        val band = b % nBands
        val lo = span * band / nBands
        // 40 updates + 5 deletes inside the band, 5 inserts beyond the range
        val upd = (0 until 40).map(i => (lo + i * 7L, s"upd-$b-$i", "u", b * 1000L + i))
        val del = (0 until 5).map(i => (lo + 400L + i, s"", "d", b * 1000L + 100 + i))
        val ins = (0 until 5).map(i => (span + b * 5L + i, s"ins-$b-$i", "u", b * 1000L + 200 + i))
        val changes = (upd ++ del ++ ins).toDF("k", "v", "_op", "_seq")
        val t0 = System.nanoTime()
        val r = acs.applyChanges(changes)
        walls(b) = (System.nanoTime() - t0) / 1e9
        rewrittenTotal += r.filesRewritten
        inserted += r.inserted
      }
      val early = walls.take(5).sum / 5
      val late = walls.takeRight(5).sum / 5
      // tombstone retention: every insert (live or tombstone) adds exactly
      // one physical row; updates and tombstoning change none — so the
      // UNFILTERED row count reconciles exactly, and the live count is
      // total minus retained tombstones
      val totalRows = wh.read("t", acs.storedSchema).count()
      val tombstones = totalRows - acs.currentState().count()
      require(totalRows == startRows + inserted,
        s"row reconciliation failed at x$mult: $totalRows != $startRows + $inserted")
      emit(s"""{"probe":"cdcsoak","mult":$mult,"batches":$batches,"rows":$startRows,""" +
        s""""early_s":${f"$early%.3f"},"late_s":${f"$late%.3f"},"late_over_early":${f"${late / early}%.2f"},""" +
        s""""files_rewritten_per_batch":${f"${rewrittenTotal.toDouble / batches}%.2f"},""" +
        s""""inserted":$inserted,"tombstones":$tombstones,"end_rows":${totalRows - tombstones}}""")
    }
    out.close()
    spark.stop()
  }
}
