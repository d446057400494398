package graft

import java.nio.file.Files

import graft.sources.{AtomicWarehouse, ColGe, ColLt}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Column rename WITHOUT rewrite (column mapping): physical file column
  * names stay stable forever; a rename is one metadata commit updating the
  * recorded schema and the logical→physical map. Contract under test:
  * zero data files touched, reads/writes/stats/DML translate transparently,
  * time travel reads each era under its own names, and the declared cluster
  * columns follow the rename.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private val kv = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private val kv2 = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("label", StringType, nullable = true)))

  private def newWh() =
    new AtomicWarehouse(spark, Files.createTempDirectory("graft-cm-").toString)

  test("rename is metadata-only; old files read under the new logical name; time travel keeps eras apart") {
    val wh = newWh()
    wh.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    val filesBefore = wh.fileStats("t").keySet
    val headBefore = wh.versions().last
    wh.renameColumn("t", "v", "label")
    // not a byte rewritten
    assert(wh.fileStats("t").keySet == filesBefore)
    // live read under the new logical name
    val got = wh.read("t", kv2).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b")))
    assert(wh.currentSchema("t").get.fieldNames.toSeq == Seq("id", "label"))
    // the pre-rename era still reads under ITS name
    assert(wh.readAt("t", headBefore).columns.toSeq == Seq("id", "v"))
    assert(wh.readAt("t", kv, headBefore).collect().map(_.getString(1)).toSet == Set("a", "b"))
  }

  test("writes after a rename keep the PHYSICAL name stable; mixed-era files read as one table") {
    val wh = newWh()
    wh.append("t", Seq((1L, "a")).toDF("id", "v").coalesce(1))
    wh.renameColumn("t", "v", "label")
    wh.append("t", Seq((2L, "b")).toDF("id", "label").coalesce(1))
    // both files carry physical column 'v' on disk
    val physCols = wh.fileStats("t").keySet.map { f =>
      spark.read.parquet(wh.path("t") + "/" + f).schema.fieldNames.toSeq
    }
    assert(physCols == Set(Seq("id", "v")),
      s"physical names must stay 'v' across the rename, got $physCols")
    val got = wh.read("t", kv2).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b")))
    // rename BACK drops the mapping to identity and still reads
    wh.renameColumn("t", "label", "v")
    assert(wh.read("t", kv).collect().map(_.getString(1)).toSet == Set("a", "b"))
  }

  test("stats skipping, DML, and cluster declarations translate across a rename") {
    val wh = newWh()
    wh.appendClustered("t", (0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      Seq("id"), numFiles = 4)
    wh.renameColumn("t", "id", "key")
    assert(wh.clusterBy("t").contains(Seq("key")), "cluster declaration must follow the rename")
    val sch = StructType(Seq(StructField("key", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    // pruning on the NEW name (stats live under the physical name)
    val (kept, skipped) = wh.planFiles("t", Seq(ColGe("key", 10L), ColLt("key", 20L)))
    assert(kept.size == 1 && skipped.size == 3, s"kept=$kept")
    assert(wh.scanWhere("t", sch, Seq(ColGe("key", 10L), ColLt("key", 20L))).count() == 10)
    // metadata aggregates translate too
    assert(wh.countWhere("t", sch, Seq(ColLt("key", 20L))).count == 20L)
    val mm = wh.statsMinMax("t", sch, "key")
    assert(mm.min.contains(0L) && mm.max.contains(39L) && mm.filesRead == 0)
    // copy-on-write DML under the new name
    assert(wh.deleteWhere("t", sch, Seq(ColGe("key", 30L))) == 10L)
    assert(wh.read("t", sch).count() == 30)
    val r = wh.mergeInto("t", sch, Seq((5L, "m5"), (100L, "m100")).toDF("key", "v"), Seq("key"))
    assert(r.updated == 1L && r.inserted == 1L, s"got $r")
  }

  test("dropColumn: metadata-only, eras keep the column, resurrection is refused") {
    val wh = newWh()
    wh.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    val filesBefore = wh.fileStats("t").keySet
    val headBefore = wh.versions().last
    wh.dropColumn("t", "v")
    assert(wh.fileStats("t").keySet == filesBefore, "drop must touch no data file")
    assert(wh.currentSchema("t").get.fieldNames.toSeq == Seq("id"))
    assert(wh.read("t", wh.currentSchema("t").get).columns.toSeq == Seq("id"))
    assert(wh.inferSchema("t").get.fieldNames.toSeq == Seq("id"),
      "inferSchema must not resurrect dropped bytes")
    // the pre-drop era still carries the column
    assert(wh.readAt("t", headBefore).columns.toSeq == Seq("id", "v"))
    assert(wh.readAt("t", kv, headBefore).collect().map(_.getString(1)).toSet == Set("a", "b"))
    // a NEW column named 'v' would read the dropped column's old bytes out
    // of pre-drop files — refused with a way out
    val boom = intercept[IllegalArgumentException](
      wh.append("t", Seq((3L, "NEW")).toDF("id", "v")))
    assert(boom.getMessage.contains("DROPPED"))
    // adding under another name works; renames still compose
    wh.append("t", Seq((3L, "w3")).toDF("id", "w").coalesce(1))
    val sch2 = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("w", StringType, nullable = true)))
    val got = wh.read("t", sch2).collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set((1L, None), (2L, None), (3L, Some("w3"))))
  }

  test("dropColumn refusals: cluster column, last column") {
    val wh = newWh()
    wh.appendClustered("t", Seq((1L, "a")).toDF("id", "v"), Seq("id"), 1)
    intercept[IllegalArgumentException](wh.dropColumn("t", "id")) // declared cluster col
    wh.dropColumn("t", "v")
    intercept[IllegalArgumentException](wh.dropColumn("t", "id")) // last column
  }

  test("rename refusals: unknown column, duplicate name, no recorded schema") {
    val wh = newWh()
    wh.append("t", Seq((1L, "a")).toDF("id", "v"))
    intercept[IllegalArgumentException](wh.renameColumn("t", "nope", "x"))
    intercept[IllegalArgumentException](wh.renameColumn("t", "v", "id"))
    intercept[IllegalStateException](wh.renameColumn("raw_never_written", "a", "b"))
  }

  test("restore to a pre-drop version restores colmap atomically: the table is writable again") {
    val wh = newWh()
    wh.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    val preDrop = wh.versions().last
    wh.dropColumn("t", "v")
    wh.append("t", Seq((3L, 0L)).toDF("id", "pad").drop("pad").coalesce(1))
    wh.restore("t", preDrop)
    // schema regained 'v' AND the tombstone is gone — an append carrying the
    // restored column must succeed, not hit the resurrection guard
    assert(wh.currentSchema("t").get.fieldNames.toSeq == Seq("id", "v"))
    wh.append("t", Seq((4L, "d")).toDF("id", "v").coalesce(1))
    val got = wh.read("t", kv).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (4L, "d")))
  }

  test("restore to a pre-rename version restores the era's colmap and cluster declaration") {
    val wh = newWh()
    wh.appendClustered("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Seq("id"), 1)
    val preRename = wh.versions().last
    wh.renameColumn("t", "v", "label")
    wh.setClusterBy("t", Seq("label"))
    wh.restore("t", preRename)
    // the era had NO colmap (identity) and cluster=id: both come back
    assert(wh.currentSchema("t").get.fieldNames.toSeq == Seq("id", "v"))
    assert(wh.clusterBy("t").contains(Seq("id")))
    wh.append("t", Seq((3L, "c")).toDF("id", "v").coalesce(1))
    // physical files carry 'v' (identity map restored, not the rename's)
    val physCols = wh.fileStats("t").keySet.map(f =>
      spark.read.parquet(wh.path("t") + "/" + f).schema.fieldNames.toSeq)
    assert(physCols == Set(Seq("id", "v")))
  }

  test("widenColumn: metadata-only int→long, mixed-era reads exact, eras keep their width") {
    val wh = newWh()
    val narrow = StructType(Seq(
      StructField("id", org.apache.spark.sql.types.IntegerType, nullable = false),
      StructField("x", org.apache.spark.sql.types.FloatType, nullable = true)))
    wh.append("t", Seq((1, 1.5f), (2, 2.5f)).toDF("id", "x").coalesce(1))
    val preWiden = wh.versions().last
    val filesBefore = wh.fileStats("t").keySet
    wh.widenColumn("t", "id", LongType)
    wh.widenColumn("t", "x", org.apache.spark.sql.types.DoubleType)
    assert(wh.fileStats("t").keySet == filesBefore, "widening must rewrite nothing")
    // post-widen append carries values only the WIDE type can hold
    val big = Int.MaxValue.toLong + 10L
    wh.append("t", Seq((big, 9.25)).toDF("id", "x").coalesce(1))
    val wide = wh.currentSchema("t").get
    assert(wide("id").dataType == LongType)
    val got = wh.read("t", wide).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 1.5), (2L, 2.5), (big, 9.25)))
    // the pre-widen era still reads under ITS narrower schema
    assert(wh.schemaAt("t", preWiden).get("id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(wh.readAt("t", preWiden).collect().map(_.getInt(0)).toSet == Set(1, 2))
    // stats skipping across mixed-width eras: a long predicate prunes the
    // int-era file (BigDecimal-exact comparison, width-agnostic)
    val (kept, skipped) = wh.planFiles("t", Seq(ColGe("id", big)))
    assert(kept.size == 1 && skipped.size == 1, s"got $kept / $skipped")
    // DML over mixed eras keeps the wide schema
    wh.updateWhere("t", wide, Seq(ColGe("id", big)), Seq("x" -> lit(0.5)))
    assert(wh.read("t", wide).filter(col("id") === big).head().getDouble(1) == 0.5)
  }

  test("widenColumn refusals: narrowing, lossy, non-numeric, unknown; same-type no-ops") {
    val wh = newWh()
    wh.append("t", Seq((1L, "a")).toDF("id", "v").coalesce(1))
    intercept[IllegalArgumentException](
      wh.widenColumn("t", "id", org.apache.spark.sql.types.IntegerType)) // narrowing
    intercept[IllegalArgumentException](
      wh.widenColumn("t", "id", org.apache.spark.sql.types.DoubleType)) // long→double is lossy
    intercept[IllegalArgumentException](
      wh.widenColumn("t", "v", LongType)) // string→long
    intercept[IllegalArgumentException](wh.widenColumn("t", "nope", LongType))
    val head = wh.versions().last
    wh.widenColumn("t", "id", LongType) // already long: no commit
    assert(wh.versions().last == head)
  }

  test("delete(table) clears colmap and cluster: a re-created table starts with identity metadata") {
    val wh = newWh()
    wh.appendClustered("t", Seq((1L, "a")).toDF("id", "v"), Seq("id"), 1)
    wh.dropColumn("t", "v")
    wh.renameColumn("t", "id", "key")
    wh.delete("t")
    assert(wh.clusterBy("t").isEmpty)
    // a new column named like the dropped column's physical name is WELCOME
    // now, and 'id' writes under its own name (no silent remap to 'key')
    wh.append("t", Seq((1L, "fresh")).toDF("id", "v").coalesce(1))
    val phys = wh.fileStats("t").keySet.map(f =>
      spark.read.parquet(wh.path("t") + "/" + f).schema.fieldNames.toSeq)
    assert(phys == Set(Seq("id", "v")))
    val got = wh.read("t", kv).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "fresh")))
  }
}
