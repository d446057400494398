package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Micro-verifier for the point-probe mechanism in isolation: does a literal
  * `In` predicate on a sorted parquet column actually prune row groups?
  * Prints records/bytes read for a full scan vs an In-filtered scan of the
  * same table, plus the formatted plan (PushedFilters line). Used to debug
  * ScaleProbe; kept as the smallest reproducer of the layout claim.
  */
object PushdownCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().appName("pushdown-check").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val bytes = new AtomicLong(); val recs = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
        recs.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
    })

    val n = 2000000L
    val dir = Files.createTempDirectory("graft-pushdown-").toString + "/t"
    spark.range(n).select($"id",
        md5(concat($"id".cast("string"), lit("#k"))).as("key"))
      .repartitionByRange(32, $"key").sortWithinPartitions("key")
      .write.option("parquet.block.size", "32768").option("parquet.page.size", "8192")
      .mode(SaveMode.Overwrite).parquet(dir)

    val keys = (0 until 200).map(i => // 200 existing keys, scattered
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"${i * 9973}#k"))

    def measure(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { rep =>
        bytes.set(0); recs.set(0)
        val t0 = System.nanoTime()
        val out = f
        if (rep == 2)
          println(f"PUSHDOWN $label%-18s rows=$out%8d recordsRead=${recs.get()}%9d bytesRead=${bytes.get()}%10d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    val t = spark.read.parquet(dir)
    measure("fullscan")(t.count())
    measure("in-filter")(t.filter($"key".isin(keys: _*)).count())
    measure("in-filter-agg")(t.filter($"key".isin(keys: _*)).agg(count(lit(1))).head().getLong(0))

    println("---- formatted plan of the In-filtered scan ----")
    t.filter($"key".isin(keys: _*)).explain("formatted")
    spark.stop()
  }
}
