package graft

import java.nio.file.Files

import graft.sources.{AtomicWarehouse, ColEq, ColGe, ColIn, ColLt}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Write-time CHANGE DATA FEED (the Delta CDF shape): with the per-table
  * `changefeed` property on, every row-level DML commit records its exact
  * row changes (insert / update_preimage / update_postimage / delete) into
  * `<table>/_changes` IN THE SAME manifest commit, and `changesBetween`
  * stitches a version window into one frame — pure-append commits read
  * back as inserts from their data files (no write amplification), DML
  * commits read their recorded slice. Contract under test: per-op slice
  * exactness for delete/update/merge/DV-delete, version labels, the
  * replays-truncate/feed-off refusals, and same-commit atomicity.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private val kv = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def newWh() =
    new AtomicWarehouse(spark, Files.createTempDirectory("graft-cdf-").toString)

  private def changes(wh: AtomicWarehouse, from: Int, to: Int): Seq[(String, Long, String, Int)] =
    wh.changesBetween("t", kv, from, to).collect()
      .map(r => (r.getString(2), r.getLong(0), r.getString(1), r.getInt(3))).toSeq

  test("deleteWhere/updateWhere record exact slices; appends derive inserts; versions label rows") {
    val wh = newWh()
    wh.setChangeFeed("t", on = true)
    assert(wh.changeFeedEnabled("t"))
    val v0 = wh.versions().lastOption.getOrElse(0)
    wh.append("t", (0L until 6L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    wh.deleteWhere("t", kv, Seq(ColEq("id", 2L)))
    wh.updateWhere("t", kv, Seq(ColGe("id", 4L)), Seq("v" -> lit("UP")))
    val head = wh.versions().last
    val got = changes(wh, v0, head)
    val byType = got.groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSet).toMap
    assert(byType("insert") == (0L until 6L).map(i => (i, s"v$i")).toSet)
    assert(byType("delete") == Set((2L, "v2")))
    assert(byType("update_preimage") == Set((4L, "v4"), (5L, "v5")))
    assert(byType("update_postimage") == Set((4L, "UP"), (5L, "UP")))
    // version labels: three distinct commit versions, ascending with op order
    val vIns = got.filter(_._1 == "insert").map(_._4).distinct
    val vDel = got.filter(_._1 == "delete").map(_._4).distinct
    val vUpd = got.filter(_._1 == "update_preimage").map(_._4).distinct
    assert(vIns.size == 1 && vDel.size == 1 && vUpd.size == 1)
    assert(vIns.head < vDel.head && vDel.head < vUpd.head)
    // a sub-window sees only its slice
    assert(changes(wh, vDel.head, vUpd.head).forall(_._1.startsWith("update")))
  }

  test("mergeInto records delete/update-pre/update-post/insert in one slice") {
    val wh = newWh()
    wh.setChangeFeed("t", on = true)
    wh.append("t", (0L until 6L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val from = wh.versions().last
    val src = Seq((1L, "DEL"), (3L, "upd3"), (100L, "new")).toDF("id", "v")
    wh.mergeInto("t", kv, src, Seq("id"),
      whenMatchedDelete = Some(col("s.v") === lit("DEL")))
    val got = changes(wh, from, wh.versions().last)
    val byType = got.groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSet).toMap
    assert(byType("delete") == Set((1L, "v1")))
    assert(byType("update_preimage") == Set((3L, "v3")))
    assert(byType("update_postimage") == Set((3L, "upd3")))
    assert(byType("insert") == Set((100L, "new")))
  }

  test("deleteWhereDv records its slice atomically with the dv lines") {
    val wh = newWh()
    wh.setChangeFeed("t", on = true)
    wh.append("t", (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val from = wh.versions().last
    val r = wh.deleteWhereDv("t", kv, Seq(ColIn("id", Seq(3L, 7L))))
    assert(r.deleted == 2L && r.filesRewritten == 0)
    val got = changes(wh, from, wh.versions().last)
    assert(got.map(x => (x._1, x._2)).toSet == Set(("delete", 3L), ("delete", 7L)))
    // re-deleting overlapping keys yields only the NEW row in the feed
    val from2 = wh.versions().last
    wh.deleteWhereDv("t", kv, Seq(ColIn("id", Seq(7L, 8L))))
    val got2 = changes(wh, from2, wh.versions().last)
    assert(got2.map(x => (x._1, x._2)).toSet == Set(("delete", 8L)))
  }

  test("refusals: DML before the feed was on; truncate/replace windows; feed property lifecycle") {
    val wh = newWh()
    wh.append("t", (0L until 4L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val v1 = wh.versions().last
    wh.deleteWhere("t", kv, Seq(ColEq("id", 1L))) // feed OFF: no slice recorded
    val v2 = wh.versions().last
    val e = intercept[IllegalStateException](wh.changesBetween("t", kv, v1, v2))
    assert(e.getMessage.contains("change feed was not enabled"))
    // a replace inside the window is not a row-level change
    wh.replace("t", Seq((9L, "z")).toDF("id", "v"))
    val e2 = intercept[IllegalStateException](
      wh.changesBetween("t", kv, v2, wh.versions().last))
    assert(e2.getMessage.contains("not a row-level change"))
    // enable → record → disable stops recording
    wh.setChangeFeed("t", on = true)
    val v3 = wh.versions().last
    wh.deleteWhere("t", kv, Seq(ColEq("id", 9L)))
    assert(changes(wh, v3, wh.versions().last).map(_._1) == Seq("delete"))
    wh.setChangeFeed("t", on = false)
    assert(!wh.changeFeedEnabled("t"))
  }

  test("row-preserving maintenance is feed-transparent: compactDv/reclusterIncremental skip, not refuse") {
    val wh = newWh()
    wh.setChangeFeed("t", on = true)
    wh.append("t", (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    wh.append("t", (5L until 15L).map(i => (i, s"w$i")).toDF("id", "v").coalesce(1))
    val from = wh.versions().last
    wh.deleteWhereDv("t", kv, Seq(ColIn("id", Seq(1L, 2L, 3L))))
    wh.compactDv("t", kv, minDeadFraction = 0.1) // folds the DV — file churn, zero row change
    // the two files overlap on [5,9] → both re-banded (row-preserving)
    wh.reclusterIncremental("t", kv, Seq("id"), maxOverlap = 0, outFiles = 2)
    wh.deleteWhere("t", kv, Seq(ColEq("id", 12L)))
    val got = changes(wh, from, wh.versions().last)
    // the feed sees ONLY the row changes; both maintenance commits vanish
    assert(got.map(x => (x._1, x._2)).toSet ==
      Set(("delete", 1L), ("delete", 2L), ("delete", 3L), ("delete", 12L)), s"got $got")
  }

  test("a reclaimed change-slice file refuses with the lost-files message, not a raw FileNotFound") {
    val dir = Files.createTempDirectory("graft-cdf-lost-")
    val wh = new AtomicWarehouse(spark, dir.toString)
    wh.setChangeFeed("t", on = true)
    wh.append("t", (0L until 6L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val from = wh.versions().last
    wh.deleteWhere("t", kv, Seq(ColEq("id", 2L)))
    val to = wh.versions().last
    assert(changes(wh, from, to).map(_._1) == Seq("delete")) // window reads fine
    // simulate vacuum reclaiming the recorded slice after a restore
    // truncated the _changes table's visibility
    val chDir = new java.io.File(dir.toFile, "t/_changes")
    val slices = Option(chDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(slices.nonEmpty, "fixture: expected recorded slice files")
    slices.foreach(f => assert(f.delete()))
    val e = intercept[IllegalStateException](wh.changesBetween("t", kv, from, to))
    assert(e.getMessage.contains("change-slice") && e.getMessage.contains("vacuum"),
      s"wanted the documented refusal, got: ${e.getMessage}")
  }

  test("purgeChanges raises the floor: sub-floor windows refuse, above-floor replay, vacuum reclaims") {
    val dir = Files.createTempDirectory("graft-cdf-purge-")
    val wh = new AtomicWarehouse(spark, dir.toString)
    wh.setChangeFeed("t", on = true)
    wh.append("t", (0L until 8L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    wh.deleteWhere("t", kv, Seq(ColEq("id", 1L)))
    val midV = wh.versions().last
    wh.updateWhere("t", kv, Seq(ColEq("id", 2L)), Seq("v" -> lit("UP")))
    val head = wh.versions().last
    // purge the delete's slice; the update's survives
    val freed = wh.purgeChanges("t", midV + 1)
    assert(freed >= 1, "the delete's slice file(s) must be freed")
    assert(wh.changeFeedFloor("t") == midV + 1)
    // a window reaching below the floor refuses with the reseed message
    val e = intercept[IllegalStateException](wh.changesBetween("t", kv, 0, head))
    assert(e.getMessage.contains("purged below version") &&
      e.getMessage.contains("reseed"), e.getMessage)
    // an at-floor window (fromVersion = floor - 1) replays unchanged
    assert(changes(wh, midV, head).map(x => (x._1, x._2)).toSet ==
      Set(("update_preimage", 2L), ("update_postimage", 2L)))
    // the floor is monotone
    intercept[IllegalArgumentException](wh.purgeChanges("t", midV))
    // vacuum reclaims the freed slice bytes; the surviving slice stays
    val chDir = new java.io.File(dir.toFile, "t/_changes")
    def sliceCount = Option(chDir.listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val before = sliceCount
    wh.vacuum(olderThanMs = 0L)
    assert(sliceCount == before - freed,
      s"vacuum must reclaim exactly the $freed purged slice files")
    // the floor survives the vacuum's fold-snapshot (the snapshot re-emits
    // the cdffloor line), so the refusal stays the RETENTION message, not
    // a raw manifest-gap error (vacuum(0) GC'd every pre-snapshot manifest,
    // so all historical windows are gone regardless — the floor names why)
    assert(wh.changeFeedFloor("t") == midV + 1, "floor lost in the fold")
    val e2 = intercept[IllegalStateException](wh.changesBetween("t", kv, 0, head))
    assert(e2.getMessage.contains("purged below version"))
    // a full delete clears the floor with the table's other metadata
    wh.delete("t")
    assert(wh.changeFeedFloor("t") == 0)
  }

  test("CDC composition: changesBetween replays to the live state") {
    val wh = newWh()
    wh.setChangeFeed("t", on = true)
    wh.append("t", (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    wh.updateWhere("t", kv, Seq(ColLt("id", 5L)), Seq("v" -> concat(lit("U"), col("v"))))
    wh.deleteWhere("t", kv, Seq(ColGe("id", 15L)))
    wh.mergeInto("t", kv, Seq((7L, "m7"), (50L, "m50")).toDF("id", "v"), Seq("id"))
    val feed = wh.changesBetween("t", kv, 0, wh.versions().last)
    // fold the feed in version order: inserts/post-images assert, deletes retract
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("_commit_version").desc,
        // within one version an update's post-image supersedes its pre-image
        when(col("_change_type") === "update_postimage", 1)
          .when(col("_change_type") === "insert", 1).otherwise(0).desc)
    val replayed = feed.filter(col("_change_type") =!= "update_preimage")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("_change_type") =!= "delete")
      .select(col("id"), col("v"))
    val live = wh.read("t", kv)
    assert(replayed.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      live.collect().map(r => (r.getLong(0), r.getString(1))).toSet,
      "replaying the change feed must reconstruct the live state")
  }
}
