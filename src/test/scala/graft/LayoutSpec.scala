package graft

import java.nio.file.Files

import graft.sources.Warehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Storage layout at scale: hive-partitioned writes must prune at planning
  * time, and small-file compaction must collapse append debris without
  * changing the data.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned append prunes non-matching partitions from the scan") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft-layout-").toString)
    val df = spark.range(0, 1000)
      .select(col("id"), concat(lit("2024-01-0"), (col("id") % 5 + 1)).as("day"),
        (col("id") * 2).as("v"))
    wh.appendPartitioned("events_p", df, Seq("day"))

    val q = spark.read.parquet(wh.path("events_p")).filter(col("day") === "2024-01-03")
    // pruning happens at planning: the scan's partition count is 1 of 5
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"), s"no partition filter in:\n$scan")
    assert(q.count() == 200)
    assert(q.agg(sum("v")).head().getLong(0) ==
      (0L until 1000L).filter(_ % 5 == 2).map(_ * 2).sum)
  }

  test("compact collapses small files and preserves contents") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft-compact-").toString)
    val s2 = StructType(Seq(StructField("id", LongType), StructField("v", LongType)))
    (0 until 12).foreach { i =>
      wh.append("tiny", Seq((i.toLong, i * 10L)).toDF("id", "v").coalesce(1))
    }
    def files() = new java.io.File(wh.path("tiny"))
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files() >= 12)
    val before = wh.read("tiny", s2).orderBy("id").collect().toSeq
    wh.compact("tiny", s2, targetFiles = 1)
    assert(files() == 1)
    assert(wh.read("tiny", s2).orderBy("id").collect().toSeq == before)
  }
}
