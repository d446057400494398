package graft

import java.nio.file.Files

import graft.sources.{AtomicWarehouse, Warehouse}
import graft.tools.Maintain
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The ops maintenance pass: compact every table to one file, fold the
  * transactional log, collect superseded data files — visible state
  * unchanged throughout.
  */
class MaintainSpec extends SparkSpec {
  import spark.implicits._

  private val kv = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def rows(wh: Warehouse, t: String): Set[(Long, String)] =
    wh.read(t, kv).collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def parquetFiles(dir: String): Seq[String] = {
    val s = Files.walk(java.nio.file.Paths.get(dir))
    try s.filter(_.toString.endsWith(".parquet")).map[String](_.toString)
      .toArray.toSeq.map(_.toString)
    finally s.close()
  }

  test("maintain on an atomic warehouse: compacts, folds the log, keeps state") {
    val dir = Files.createTempDirectory("graft-maint-").toString
    val wh = new AtomicWarehouse(spark, dir)
    (1 to 6).foreach(i => wh.append("dedup/idx", Seq((i.toLong, s"v$i")).toDF("id", "v")))
    (1 to 6).foreach(i => wh.append("docs", Seq((i.toLong, s"d$i")).toDF("id", "v")))
    val idxBefore = rows(wh, "dedup/idx")
    val docsBefore = rows(wh, "docs")
    assert(parquetFiles(s"$dir/docs").size >= 6)

    // table discovery must find exactly the two tables and no infrastructure
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(Maintain.discoverTables(fs, dir) == Seq("dedup/idx", "docs"))

    Thread.sleep(50) // mtimes are ms-granular; age everything past the cutoff
    Maintain.run(spark, dir, Seq("dedup/idx:id", "docs"), graceMs = 1)

    assert(rows(wh, "dedup/idx") == idxBefore, "maintenance must not change state")
    assert(rows(wh, "docs") == docsBefore)
    assert(parquetFiles(s"$dir/docs").size == 1,
      s"expected 1 data file after compact+vacuum, got ${parquetFiles(s"$dir/docs")}")
    assert(parquetFiles(s"$dir/dedup").size == 1)
    val logFiles = Files.list(java.nio.file.Paths.get(dir, "_txlog"))
      .filter(p => p.getFileName.toString.matches("v\\d{8}(\\.snap)?\\.tsv"))
      .map[String](_.getFileName.toString).toArray.toSeq.map(_.toString)
    assert(logFiles.size == 1 && logFiles.head.endsWith(".snap.tsv"),
      s"expected the log folded to one snapshot, found $logFiles")
  }

  test("maintain on a base warehouse: discovery path compacts everything") {
    val dir = Files.createTempDirectory("graft-maint-base-").toString
    val wh = new Warehouse(spark, dir)
    (1 to 5).foreach(i => wh.append("t", Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val before = rows(wh, "t")
    Maintain.run(spark, dir, Nil) // no table specs: discover
    assert(rows(wh, "t") == before)
    assert(parquetFiles(s"$dir/t").size == 1)
  }
}
