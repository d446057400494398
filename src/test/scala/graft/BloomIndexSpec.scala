package graft

import java.nio.file.Files

import graft.sources.{AtomicWarehouse, ColEq, ColIn, ColOr, Warehouse}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Per-file Bloom index: the point-lookup skipping regime min/max and
  * dictionary value sets cannot serve (high-cardinality key, unclustered
  * layout — every file's range spans the domain). Contract under test:
  * pruning is SOUND (scanWhere ≡ read+filter for every key, present or
  * absent — no false negatives by construction), effective (a point lookup
  * opens ~1 of the hash-banded files), maintained by every DML rewrite in
  * the same commit, backfillable without rewriting data, vacuumed with its
  * data files, and restored with its era.
  */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private val kv = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def newWh() =
    new AtomicWarehouse(spark, Files.createTempDirectory("graft-bloom-").toString)

  /** Four single-file commits HASH-banded by id % 4: every file's [min,max]
    * spans nearly the whole domain (min/max useless) and carries 100+
    * distinct strings (over the value-set cap) — only the Bloom index can
    * prune a point lookup.
    */
  private def hashBanded(wh: AtomicWarehouse, table: String = "t", n: Int = 400): Unit =
    (0 until 4).foreach { r =>
      wh.append(table, (0 until n).filter(_ % 4 == r)
        .map(i => (i.toLong, s"name-$i")).toDF("id", "v").coalesce(1))
    }

  test("point lookup on a hash-banded table prunes to ~1 file and stays row-exact") {
    val wh = newWh()
    wh.setBloomIndex("t", Seq("id", "v"), fpp = 0.001)
    hashBanded(wh)
    assert(wh.describe("t").bloomFiles == 4 && wh.describe("t").bloomCols == Seq("id", "v"))
    // every present key: exactly its row, opening at most 2 of 4 files
    Seq(0L, 17L, 42L, 399L).foreach { k =>
      val (kept, skipped) = wh.planFiles("t", Seq(ColEq("id", k)))
      assert(kept.size <= 2 && skipped.size >= 2, s"key $k kept ${kept.size}")
      val got = wh.scanWhere("t", kv, Seq(ColEq("id", k))).collect()
      assert(got.map(_.getLong(0)).toSeq == Seq(k))
    }
    // absent keys: zero rows; bloom proves absence in (almost) every file
    Seq(400L, 100000L, -5L).foreach { k =>
      val (kept, _) = wh.planFiles("t", Seq(ColEq("id", k)))
      assert(kept.size <= 1, s"absent key $k kept ${kept.size}")
      assert(wh.scanWhere("t", kv, Seq(ColEq("id", k))).isEmpty)
    }
    // string column: same index, same soundness
    val (keptS, skippedS) = wh.planFiles("t", Seq(ColEq("v", "name-42")))
    assert(keptS.size <= 2 && skippedS.size >= 2)
    assert(wh.scanWhere("t", kv, Seq(ColEq("v", "name-42")))
      .collect().map(_.getLong(0)).toSeq == Seq(42L))
    assert(wh.scanWhere("t", kv, Seq(ColEq("v", "nobody"))).isEmpty)
  }

  test("a log fold-to-snapshot preserves the declaration and every pointer") {
    val dir = Files.createTempDirectory("graft-bloomfold-").toString
    val wh = new AtomicWarehouse(spark, dir, logFoldEvery = 4)
    wh.setBloomIndex("t", Seq("id"), fpp = 0.001)
    hashBanded(wh) // 5 commits so far; cross the fold threshold with churn
    (0 until 4).foreach(_ => wh.append("other",
      Seq((1L, "x")).toDF("id", "v").coalesce(1)))
    // a fresh instance sees only the folded log — amnesia would surface here
    val wh2 = new AtomicWarehouse(spark, dir)
    assert(wh2.bloomIndex("t").map(_._1).contains(Seq("id")),
      "fold dropped the bloomcols declaration")
    assert(wh2.describe("t").bloomFiles == 4,
      "fold dropped per-file bloom pointers")
    val (kept, skipped) = wh2.planFiles("t", Seq(ColEq("id", 42L)))
    assert(kept.size <= 2 && skipped.size >= 2,
      s"point lookup kept ${kept.size} of 4 after fold")
    assert(wh2.scanWhere("t", kv, Seq(ColEq("id", 42L)))
      .collect().map(_.getLong(0)).toSeq == Seq(42L))
  }

  test("soundness sweep: every row findable; IN-lists and ORs keep the union") {
    val wh = newWh()
    wh.setBloomIndex("t", Seq("id"), fpp = 0.001)
    hashBanded(wh, n = 100)
    // exhaustive: no false negatives anywhere
    (0L until 100L).foreach { k =>
      assert(wh.scanWhere("t", kv, Seq(ColEq("id", k))).count() == 1L, s"lost id $k")
    }
    // IN across two residues: both homes kept, both rows back
    val in = wh.scanWhere("t", kv, Seq(ColIn("id", Seq(13L, 22L))))
      .collect().map(_.getLong(0)).toSet
    assert(in == Set(13L, 22L))
    // OR of two point lookups (disjunct-wise bloom, mirrors mayContain)
    val or = wh.scanWhere("t", kv,
      Seq(ColOr(Seq(Seq(ColEq("id", 13L)), Seq(ColEq("id", 22L))))))
      .collect().map(_.getLong(0)).toSet
    assert(or == Set(13L, 22L))
    val (keptOr, _) = wh.planFiles("t",
      Seq(ColOr(Seq(Seq(ColEq("id", 13L)), Seq(ColEq("id", 22L))))))
    assert(keptOr.size <= 3)
    // Int probe value hits the Long-tagged filter via the probe coercion
    assert(wh.scanWhere("t", kv, Seq(ColEq("id", 13))).count() == 1L)
  }

  test("mismatched types, unindexed columns, and range legs always keep") {
    val wh = newWh()
    wh.setBloomIndex("t", Seq("id"), fpp = 0.001)
    hashBanded(wh, n = 100)
    // string value against the long-tagged filter: keeps (prunes nothing, loses nothing)
    val (k1, _) = wh.planFiles("t", Seq(ColEq("id", "13")))
    assert(k1.size == 4)
    // unindexed column: bloom silent
    val (k2, _) = wh.planFiles("t", Seq(ColEq("v", "name-13")))
    assert(k2.size == 4)
    // range legs never consult the bloom
    val (k3, _) = wh.planFiles("t", Seq(graft.sources.ColGe("id", 0L)))
    assert(k3.size == 4)
  }

  test("DML rewrites re-index in the same commit; old sidecars become vacuumable") {
    val root = Files.createTempDirectory("graft-bloomvac-").toString
    val wh = new AtomicWarehouse(spark, root)
    wh.setBloomIndex("t", Seq("id"), fpp = 0.001)
    hashBanded(wh, n = 100)
    val before = wh.describe("t")
    assert(before.bloomFiles == before.files)
    // copy-on-write delete rewrites the hit files — their rewrites arrive indexed
    assert(wh.deleteWhere("t", kv, Seq(ColIn("id", Seq(8L, 9L)))) == 2L)
    val after = wh.describe("t")
    assert(after.bloomFiles == after.files, "rewritten files must be re-indexed")
    assert(wh.scanWhere("t", kv, Seq(ColEq("id", 8L))).isEmpty)
    assert(wh.scanWhere("t", kv, Seq(ColEq("id", 10L))).count() == 1L)
    // the rewrite's sidecar removes make the superseded filters vacuumable:
    // post-vacuum the physical _bloom dir holds exactly the live sidecars
    wh.vacuum(olderThanMs = 0L)
    val bdir = new java.io.File(s"$root/t/_bloom")
    val physical = Option(bdir.listFiles())
      .map(_.count(f => f.isFile && f.getName.endsWith(".bf"))).getOrElse(0)
    assert(physical == after.bloomFiles,
      s"vacuum left $physical sidecars for ${after.bloomFiles} indexed files")
    assert(wh.scanWhere("t", kv, Seq(ColEq("id", 10L))).count() == 1L)
  }

  test("backfill indexes pre-declaration files without rewriting data") {
    val wh = newWh()
    hashBanded(wh, n = 100) // data first: nothing indexed
    wh.setBloomIndex("t", Seq("id"), fpp = 0.001)
    assert(wh.describe("t").bloomFiles == 0)
    val (kept0, _) = wh.planFiles("t", Seq(ColEq("id", 13L)))
    assert(kept0.size == 4, "unindexed files are always kept")
    val filesBefore = wh.planFiles("t", Nil)._1.sorted
    assert(wh.backfillBloomIndex("t") == 4)
    assert(wh.planFiles("t", Nil)._1.sorted == filesBefore, "backfill moved data files")
    assert(wh.describe("t").bloomFiles == 4)
    val (kept1, _) = wh.planFiles("t", Seq(ColEq("id", 13L)))
    assert(kept1.size <= 2)
    assert(wh.scanWhere("t", kv, Seq(ColEq("id", 13L))).count() == 1L)
    assert(wh.backfillBloomIndex("t") == 0, "second backfill is a no-op")
  }

  test("restore brings the era's index back; delete(table) clears the declaration") {
    val wh = newWh()
    wh.setBloomIndex("t", Seq("id"), fpp = 0.001)
    hashBanded(wh, n = 100)
    val era = wh.versions().last
    wh.deleteWhere("t", kv, Seq(ColIn("id", Seq(8L))))
    wh.restore("t", era)
    assert(wh.describe("t").bloomFiles == 4)
    assert(wh.scanWhere("t", kv, Seq(ColEq("id", 8L))).count() == 1L)
    val (kept, _) = wh.planFiles("t", Seq(ColEq("id", 13L)))
    assert(kept.size <= 2)
    // full drop clears the declaration: a re-created table starts unindexed
    wh.delete("t")
    assert(wh.bloomIndex("t").isEmpty)
    wh.append("t", Seq((1L, "a")).toDF("id", "v").coalesce(1))
    assert(wh.describe("t").bloomFiles == 0)
  }

  test("mergeInto's exact-key-set pruning composes with the index on a hash layout") {
    val wh = newWh()
    wh.setBloomIndex("t", Seq("id"), fpp = 0.001)
    hashBanded(wh, n = 100)
    // a CDC-sized source touching keys of ONE residue class: bounds span
    // the domain (useless), but the merge's ColIn candidates bloom-probe
    // down to that class's file — 1 rewritten, 3 untouched
    val r = wh.mergeInto("t", kv,
      Seq((8L, "u8"), (12L, "u12"), (416L, "i416")).toDF("id", "v"), Seq("id"))
    assert(r.updated == 2L && r.inserted == 1L)
    assert(r.filesRewritten == 1 && r.filesUntouched == 3,
      s"merge rewrote ${r.filesRewritten}, untouched ${r.filesUntouched}")
    assert(wh.scanWhere("t", kv, Seq(ColEq("id", 8L)))
      .collect().map(_.getString(1)).toSeq == Seq("u8"))
    assert(wh.scanWhere("t", kv, Seq(ColEq("id", 416L))).count() == 1L)
  }

  test("countWhere answers an absent point lookup from the index alone") {
    val wh = newWh()
    wh.setBloomIndex("t", Seq("id"), fpp = 0.001)
    hashBanded(wh, n = 100)
    val cw = wh.countWhere("t", kv, Seq(ColEq("id", 4242L)))
    assert(cw.count == 0L)
    assert(cw.filesSkipped >= 3, s"absent key read ${cw.filesRead} files")
  }
}
