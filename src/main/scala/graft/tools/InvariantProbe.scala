package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import graft.GraftSession
import graft.sources.AtomicWarehouse
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale shape of the declared-invariant checks: enforcement must cost
  * BATCH work, not table work. For a fixed-size child/insert batch against
  * a parent/table grown ×1/×4/×16, measures the wall, tasks, and records
  * the FK key probe and the UNIQUE collision probe actually touch — with a
  * Bloom index on the key (the point-lookup regime: hash-banded growth
  * keeps every file's [min,max] spanning the domain, so ONLY the sidecars
  * can route). The honest expectation: files opened per probe stays ~flat
  * (one band's worth) while the table's file count and bytes grow with the
  * multiple; wall tracks the batch, not the corpus.
  *
  * `sbt "runMain graft.tools.InvariantProbe [sfDir] [1,4,16]"` → one JSON
  * line per (phase, mult) to stdout and target/invariantprobe.json.
  */
object InvariantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mults = args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 4, 16))
    val spark = GraftSession.builder().appName("invariant-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Write MULTI-PAGE parquet files (16-row pages) so the probe's files
    // have the page structure real 100 TB-scale files have — a toy-scale
    // single-file append is ONE page, and page-granular reads (the
    // mechanism that keeps a point probe's records flat as the table
    // grows) cannot be observed against single-page files. The probe's In
    // predicates push NATIVELY to parquet (≤ the session's 1024
    // inFilterThreshold), so the reader's column-index filter decodes only
    // the pages whose [min,max] can hold a probed key. The regime that
    // matters — and that real scale has — is PAGE RANGE < KEY SPACING
    // (a 1 GB file holds thousands of pages; a point batch's keys are
    // sparse in it): then each probed key decodes ~one page per band file
    // and records track the BATCH, saturating instead of following the
    // parent. Page size and batch size here are chosen to put the toy
    // fixture in that regime at ×4/×16.
    spark.sparkContext.hadoopConfiguration.setInt("parquet.page.row.count.limit", 16)

    val recordsRead = new AtomicLong(); val tasks = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        recordsRead.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        tasks.incrementAndGet()
      }
    })
    def measured[T](f: => T): (T, Long, Long, Double) = {
      Thread.sleep(300)
      recordsRead.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      (r, recordsRead.get, tasks.get, wall)
    }
    val out = new java.io.PrintWriter(new java.io.FileWriter("target/invariantprobe.json"))
    def emit(l: String): Unit = { println(l); out.println(l); out.flush() }

    val ordersBase = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"))
    val baseMax = ordersBase.agg(max(col("k"))).head().getLong(0) + 1

    mults.foreach { mult =>
      val parent = (0 until mult).map(i => ordersBase
        .select((col("k") + lit(i * baseMax)).as("k"), col("cents")))
        .reduce(_ union _)
      val span = baseMax * mult
      val nBands = 16
      val root = Files.createTempDirectory(s"graft-invprobe-x$mult-").toString
      val wh = new AtomicWarehouse(spark, root)
      wh.setBloomIndex("parent", Seq("k"), fpp = 0.001)
      // HASH-banded: every file's [min,max] spans the domain — the regime
      // where only the Bloom sidecars can route the point probes
      (0 until nBands).foreach { b =>
        wh.append("parent", parent.filter(col("k") % nBands === b).coalesce(1))
      }
      val pd = wh.describe("parent")
      wh.addForeignKey("child", "p_ref", "parent", "k", "fk")
      wh.addUniqueKey("parent", "k", "pk")

      // fixed-size child batch: 200 LIVE parent keys spread across the
      // domain (deterministic arbitrary sample — orderkeys are sparse)
      val sampled = parent.select(col("k"))
        .orderBy(pmod(col("k"), lit(997L)), col("k")).limit(200)
        .collect().map(_.getLong(0))
      val batch = sampled.zipWithIndex
        .map { case (k, i) => (i.toLong, k) }.toSeq.toDF("c_id", "p_ref")
      val ((), fkR, fkT, fkW) = measured {
        wh.append("child", batch.coalesce(1)); ()
      }
      emit(s"""{"probe":"invariant","phase":"fk_append","mult":$mult,""" +
        s""""parent_files":${pd.files},"parent_rows":${pd.rows},""" +
        s""""batch_rows":200,"records":$fkR,"tasks":$fkT,"wall_s":${f"$fkW%.3f"}}""")

      // a fixed-size UNIQUE-checked insert of fresh keys beyond the domain
      val fresh = (0L until 500L)
        .map(i => (span + i, 0L)).toDF("k", "cents")
      val ((), uqR, uqT, uqW) = measured {
        wh.append("parent", fresh.coalesce(1)); ()
      }
      emit(s"""{"probe":"invariant","phase":"unique_append","mult":$mult,""" +
        s""""parent_files":${pd.files},"parent_rows":${pd.rows},""" +
        s""""batch_rows":500,"records":$uqR,"tasks":$uqT,"wall_s":${f"$uqW%.3f"}}""")

      // COMPOSITE unique key with a LOW-selectivity LEADING column (grp:
      // 4 values — its bounds admit every file): pruning must route on the
      // selective second column via the tuple-aware In conjunction (Bloom
      // on k), not the lead. Flat records across mults = the probe never
      // re-reads the table.
      wh.setBloomIndex("parent2", Seq("k"), fpp = 0.001)
      (0 until nBands).foreach { b =>
        wh.append("parent2", parent.filter(col("k") % nBands === b)
          .select(pmod(col("k"), lit(4L)).as("grp"), col("k"), col("cents"))
          .coalesce(1))
      }
      wh.addUniqueKey("parent2", Seq("grp", "k"), "pk2")
      val fresh2 = (0L until 500L)
        .map(i => (i % 4, span + i, 0L)).toDF("grp", "k", "cents")
      val ((), cR, cT, cW) = measured {
        wh.append("parent2", fresh2.coalesce(1)); ()
      }
      emit(s"""{"probe":"invariant","phase":"unique_composite_append","mult":$mult,""" +
        s""""parent_files":${pd.files},"parent_rows":${pd.rows},""" +
        s""""batch_rows":500,"records":$cR,"tasks":$cT,"wall_s":${f"$cW%.3f"}}""")

      // COMPOSITE FOREIGN KEY over the same pair shape: the forward probe
      // conjoins per-column In predicates, so routing rides the SELECTIVE
      // column's Bloom sidecars while the 4-value lead admits everything.
      // Flat records across mults = the child batch never pays parent-scale.
      wh.addForeignKey("child2", Seq("g_ref", "k_ref"), "parent2",
        Seq("grp", "k"), "fk2")
      val pairBatch = sampled.zipWithIndex
        .map { case (k, i) => (i.toLong, k % 4, k) }.toSeq
        .toDF("c_id", "g_ref", "k_ref")
      val ((), cfR, cfT, cfW) = measured {
        wh.append("child2", pairBatch.coalesce(1)); ()
      }
      emit(s"""{"probe":"invariant","phase":"fk_composite_append","mult":$mult,""" +
        s""""parent_files":${pd.files},"parent_rows":${pd.rows},""" +
        s""""batch_rows":200,"records":$cfR,"tasks":$cfT,"wall_s":${f"$cfW%.3f"}}""")

      // a dangling-key batch must refuse at the same probe cost
      val bad = Seq((9999L, span * 2 + 1L)).toDF("c_id", "p_ref")
      val (refused, rR, rT, rW) = measured {
        try { wh.append("child", bad); false }
        catch { case _: IllegalArgumentException => true }
      }
      require(refused, s"dangling FK batch was admitted at x$mult")
      emit(s"""{"probe":"invariant","phase":"fk_refuse","mult":$mult,""" +
        s""""records":$rR,"tasks":$rT,"wall_s":${f"$rW%.3f"}}""")
    }
    out.close()
    spark.stop()
  }
}
