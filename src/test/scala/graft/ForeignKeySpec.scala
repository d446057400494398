package graft

import java.nio.file.Files

import graft.sources.{AtomicWarehouse, ColEq, ColIn}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** FOREIGN KEY constraints — referential integrity as an engine invariant
  * (the reference's Provider/Provider_Product FK domain made declarative;
  * neither Delta nor Iceberg enforces FKs). Both directions are
  * batch-sized point probes: child batches verify their keys against the
  * parent (stats/Bloom-prunable In-probe, or a join above the cap; NULL
  * passes — SQL MATCH SIMPLE), and parent row deletes RESTRICT when a
  * child still references a leaving key. Whole-table parent ops (replace/
  * delete) refuse while the child holds rows; merge-deletes on a
  * referenced parent refuse up front.
  */
class ForeignKeySpec extends SparkSpec {
  import spark.implicits._

  private val parentS = StructType(Seq(
    StructField("p_id", LongType, nullable = false),
    StructField("p_name", StringType, nullable = true)))
  private val childS = StructType(Seq(
    StructField("c_id", LongType, nullable = false),
    StructField("p_ref", LongType, nullable = true)))

  private def newWh() =
    new AtomicWarehouse(spark, Files.createTempDirectory("graft-fk-").toString)

  private def seeded(): AtomicWarehouse = {
    val wh = newWh()
    wh.append("dim/provider", Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("p_id", "p_name").coalesce(1))
    wh.addForeignKey("fact/product", "p_ref", "dim/provider", "p_id", "fk_provider")
    wh
  }

  test("child writes verify keys against the parent; NULL passes") {
    val wh = seeded()
    wh.append("fact/product", Seq((10L, Some(1L)), (11L, Some(2L)), (12L, None))
      .toDF("c_id", "p_ref").coalesce(1))
    assert(wh.read("fact/product", childS).count() == 3)
    val e = intercept[IllegalArgumentException](
      wh.append("fact/product", Seq((13L, Some(9L))).toDF("c_id", "p_ref")))
    assert(e.getMessage.contains("fk_provider") && e.getMessage.contains("9"))
    assert(wh.read("fact/product", childS).count() == 3, "refused write leaked")
    // child UPDATE to a dangling key refuses; to a live key lands
    intercept[IllegalArgumentException](
      wh.updateWhere("fact/product", childS, Seq(ColEq("c_id", 10L)),
        Seq("p_ref" -> lit(99L))))
    wh.updateWhere("fact/product", childS, Seq(ColEq("c_id", 10L)),
      Seq("p_ref" -> lit(3L)))
    assert(wh.scanWhere("fact/product", childS, Seq(ColEq("c_id", 10L)))
      .head().getLong(1) == 3L)
  }

  test("a parent staged in the SAME transaction satisfies the child batch") {
    val wh = seeded()
    wh.atomically { w =>
      w.append("dim/provider", Seq((4L, "d")).toDF("p_id", "p_name"))
      w.append("fact/product", Seq((20L, Some(4L))).toDF("c_id", "p_ref"))
    }
    assert(wh.read("fact/product", childS).count() == 1)
    // and the refusal still aborts the WHOLE transaction
    intercept[IllegalArgumentException](wh.atomically { w =>
      w.append("dim/provider", Seq((5L, "e")).toDF("p_id", "p_name"))
      w.append("fact/product", Seq((21L, Some(6L))).toDF("c_id", "p_ref"))
    })
    assert(wh.read("dim/provider", parentS).count() == 4,
      "aborted tx leaked its parent append")
  }

  test("a staged parent append onto a DV-bearing parent validates, not aborts") {
    val wh = seeded()
    // merge-on-read delete leaves a deletion vector on the committed parent
    assert(wh.deleteWhereDv("dim/provider", parentS,
      Seq(ColIn("p_id", Seq(3L)))).filesRewritten == 0)
    wh.atomically { w =>
      w.append("dim/provider", Seq((4L, "d")).toDF("p_id", "p_name"))
      // read-your-own-writes over the DV table: committed-minus-tombstones
      // plus the staged rows
      assert(w.read("dim/provider", parentS).collect().map(_.getLong(0)).toSet ==
        Set(1L, 2L, 4L))
      w.append("fact/product", Seq((20L, Some(4L)), (21L, Some(1L)))
        .toDF("c_id", "p_ref"))
    }
    assert(wh.read("fact/product", childS).count() == 2)
    // the tombstoned key is really gone: a child referencing it refuses
    val e = intercept[IllegalArgumentException](wh.atomically { w =>
      w.append("dim/provider", Seq((5L, "e")).toDF("p_id", "p_name"))
      w.append("fact/product", Seq((22L, Some(3L))).toDF("c_id", "p_ref"))
    })
    assert(e.getMessage.contains("fk_provider"))
    assert(wh.read("dim/provider", parentS).count() == 3, // 1,2 live + 4
      "aborted tx leaked its parent append")
  }

  test("a child insert racing a parent DV-delete aborts the delete (freeze pin), never orphans") {
    val dir = Files.createTempDirectory("graft-fk-race-")
    val wh = new AtomicWarehouse(spark, dir.toString)
    val wh2 = new AtomicWarehouse(spark, dir.toString) // the \"other JVM\"
    wh.append("dim/provider", Seq((1L, "a"), (2L, "b")).toDF("p_id", "p_name").coalesce(1))
    wh.addForeignKey("fact/product", "p_ref", "dim/provider", "p_id", "fk_provider")
    wh.append("fact/product", Seq((10L, Some(2L))).toDF("c_id", "p_ref").coalesce(1))
    // the delete of key 1 probes the child (no reference — passes), then a
    // child insert REFERENCING key 1 lands through wh2 before the delete
    // publishes (alsoInTx runs inside the transaction, post-probe). The
    // child freeze pin must abort that attempt; the retry re-probes the
    // NEW child state and refuses properly. Without the pin, both commits
    // land and the child row orphans.
    val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[IllegalArgumentException](
      wh.deleteWhereDv("dim/provider", parentS, Seq(ColEq("p_id", 1L)),
        alsoInTx = _ => if (injected.compareAndSet(false, true))
          wh2.append("fact/product", Seq((11L, Some(1L))).toDF("c_id", "p_ref"))))
    assert(e.getMessage.contains("RESTRICT"), e.getMessage)
    assert(injected.get(), "fixture: the racing insert must have run")
    // no orphan: key 1 still live, both child rows reference live keys
    assert(wh.read("dim/provider", parentS).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L))
    assert(wh.read("fact/product", childS).count() == 2)
  }

  test("a parent DV-delete racing a child-insert transaction aborts the insert (parent pin)") {
    val dir = Files.createTempDirectory("graft-fk-race2-")
    val wh = new AtomicWarehouse(spark, dir.toString)
    val wh2 = new AtomicWarehouse(spark, dir.toString)
    wh.append("dim/provider", Seq((1L, "a"), (2L, "b")).toDF("p_id", "p_name").coalesce(1))
    wh.addForeignKey("fact/product", "p_ref", "dim/provider", "p_id", "fk_provider")
    // the child append probes parent key 1 (live — passes, pins the parent
    // files + DV state), then the parent delete lands through wh2 BEFORE
    // the child transaction publishes: its own child pin sees no committed
    // child change, so it lands. The child's parent pin must then abort
    // the child publish — without it the child commits an orphan.
    intercept[java.util.ConcurrentModificationException](
      wh.atomically { w =>
        w.append("fact/product", Seq((20L, Some(1L))).toDF("c_id", "p_ref"))
        wh2.deleteWhereDv("dim/provider", parentS, Seq(ColEq("p_id", 1L)))
      })
    assert(wh.read("fact/product", childS).count() == 0, "orphan leaked")
    assert(wh.read("dim/provider", parentS).collect().map(_.getLong(0)).toSet ==
      Set(2L))
    // the single-op retry path converges to the proper refusal
    val e = intercept[IllegalArgumentException](
      wh.append("fact/product", Seq((21L, Some(1L))).toDF("c_id", "p_ref")))
    assert(e.getMessage.contains("fk_provider"))
    // and a parent APPEND racing a child insert does NOT conflict (pins
    // allow pure key additions)
    wh.atomically { w =>
      w.append("fact/product", Seq((22L, Some(2L))).toDF("c_id", "p_ref"))
      wh2.append("dim/provider", Seq((3L, "c")).toDF("p_id", "p_name"))
    }
    assert(wh.read("fact/product", childS).count() == 1)
    // live parent rows: key 2 (key 1 is DV-dead) plus the raced-in key 3
    assert(wh.read("dim/provider", parentS).collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L))
  }

  test("declare-time validation refuses existing orphans") {
    val wh = newWh()
    wh.append("dim/provider", Seq((1L, "a")).toDF("p_id", "p_name").coalesce(1))
    wh.append("fact/product", Seq((10L, Some(7L))).toDF("c_id", "p_ref").coalesce(1))
    val e = intercept[IllegalArgumentException](
      wh.addForeignKey("fact/product", "p_ref", "dim/provider", "p_id", "fk"))
    assert(e.getMessage.contains("existing"))
    assert(wh.foreignKeysOf("fact/product").isEmpty)
  }

  test("parent deletes RESTRICT on referenced keys, pass on unreferenced") {
    val wh = seeded()
    wh.append("fact/product", Seq((10L, Some(1L))).toDF("c_id", "p_ref").coalesce(1))
    // copy-on-write delete of the referenced key refuses
    val e = intercept[IllegalArgumentException](
      wh.deleteWhere("dim/provider", parentS, Seq(ColEq("p_id", 1L))))
    assert(e.getMessage.contains("RESTRICT"))
    assert(wh.read("dim/provider", parentS).count() == 3)
    // DV (merge-on-read) delete of the referenced key refuses likewise
    val e2 = intercept[IllegalArgumentException](
      wh.deleteWhereDv("dim/provider", parentS, Seq(ColIn("p_id", Seq(1L)))))
    assert(e2.getMessage.contains("RESTRICT"))
    // unreferenced keys delete freely, both paths
    assert(wh.deleteWhere("dim/provider", parentS, Seq(ColEq("p_id", 2L))) == 1L)
    assert(wh.deleteWhereDv("dim/provider", parentS,
      Seq(ColIn("p_id", Seq(3L)))).deleted == 1L)
    // delete the child reference, then the parent row frees up
    wh.deleteWhere("fact/product", childS, Seq(ColEq("c_id", 10L)))
    assert(wh.deleteWhere("dim/provider", parentS, Seq(ColEq("p_id", 1L))) == 1L)
  }

  test("parent UPDATE keeping the key passes; re-keying a referenced key refuses") {
    val wh = seeded()
    wh.append("fact/product", Seq((10L, Some(1L))).toDF("c_id", "p_ref").coalesce(1))
    // non-key update: key set unchanged — allowed
    wh.updateWhere("dim/provider", parentS, Seq(ColEq("p_id", 1L)),
      Seq("p_name" -> lit("renamed")))
    // re-keying the referenced row makes key 1 leave — RESTRICT
    val e = intercept[IllegalArgumentException](
      wh.updateWhere("dim/provider", parentS, Seq(ColEq("p_id", 1L)),
        Seq("p_id" -> lit(77L))))
    assert(e.getMessage.contains("RESTRICT"))
    // re-keying an UNreferenced row is fine
    assert(wh.updateWhere("dim/provider", parentS, Seq(ColEq("p_id", 2L)),
      Seq("p_id" -> lit(78L))) == 1L)
  }

  test("whole-table parent ops refuse while the child holds rows") {
    val wh = seeded()
    wh.append("fact/product", Seq((10L, Some(1L))).toDF("c_id", "p_ref").coalesce(1))
    intercept[IllegalArgumentException](
      wh.replace("dim/provider", Seq((9L, "z")).toDF("p_id", "p_name")))
    intercept[IllegalArgumentException](wh.delete("dim/provider"))
    intercept[IllegalArgumentException](
      wh.mergeInto("dim/provider", parentS,
        Seq((1L, "x")).toDF("p_id", "p_name"), Seq("p_id"),
        whenMatchedDelete = Some(lit(true))))
    // after the child empties, the parent is free
    wh.delete("fact/product")
    wh.replace("dim/provider", Seq((9L, "z")).toDF("p_id", "p_name"))
    assert(wh.read("dim/provider", parentS).count() == 1)
  }

  test("a child emptied by deletion vectors frees the parent (metadata-proven)") {
    val wh = seeded()
    wh.append("fact/product", Seq((10L, Some(1L))).toDF("c_id", "p_ref").coalesce(1))
    intercept[IllegalArgumentException](wh.delete("dim/provider"))
    // empty the child WITHOUT removing its files: merge-on-read tombstones
    wh.deleteWhereDv("fact/product", childS, Seq(ColIn("c_id", Seq(10L))))
    assert(wh.describe("fact/product").files > 0 &&
      wh.describe("fact/product").rows == 0L)
    wh.delete("dim/provider") // zero LIVE child rows — RESTRICT releases
    assert(!wh.exists("dim/provider"))
  }

  private val ppParentS = StructType(Seq(
    StructField("prod_id", LongType, nullable = false),
    StructField("prov_id", LongType, nullable = false),
    StructField("nm", StringType, nullable = true)))
  private val ppChildS = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("prod_ref", LongType, nullable = true),
    StructField("prov_ref", LongType, nullable = true)))

  private def seededPair(): AtomicWarehouse = {
    val wh = newWh()
    wh.append("dim/pp", Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 10L, "c"))
      .toDF("prod_id", "prov_id", "nm").coalesce(1))
    wh.addForeignKey("fact/price", Seq("prod_ref", "prov_ref"), "dim/pp",
      Seq("prod_id", "prov_id"), "fk_pp")
    wh
  }

  test("COMPOSITE keys enforce the TUPLE, not the columns (the reference's " +
      "Provider_Product pair); any-null passes; RESTRICT is pair-exact") {
    val wh = seededPair()
    wh.append("fact/price", Seq((100L, Some(1L), Some(10L)))
      .toDF("id", "prod_ref", "prov_ref").coalesce(1))
    // (2, 20): both values live in their columns, the PAIR does not exist
    val e = intercept[IllegalArgumentException](
      wh.append("fact/price", Seq((101L, Some(2L), Some(20L)))
        .toDF("id", "prod_ref", "prov_ref")))
    assert(e.getMessage.contains("fk_pp") && e.getMessage.contains("(2,20)"), e.getMessage)
    // ANY null key column exempts the row (SQL MATCH SIMPLE)
    wh.append("fact/price", Seq((102L, Some(2L), None: Option[Long]))
      .toDF("id", "prod_ref", "prov_ref"))
    assert(wh.read("fact/price", ppChildS).count() == 2)
    // parent delete: the unreferenced pair (2,10) goes — even though BOTH
    // its values appear in referenced/child columns somewhere — while the
    // referenced pair (1,10) RESTRICTs, on both delete paths
    assert(wh.deleteWhere("dim/pp", ppParentS,
      Seq(ColEq("prod_id", 2L), ColEq("prov_id", 10L))) == 1L)
    val e2 = intercept[IllegalArgumentException](
      wh.deleteWhere("dim/pp", ppParentS,
        Seq(ColEq("prod_id", 1L), ColEq("prov_id", 10L))))
    assert(e2.getMessage.contains("RESTRICT") && e2.getMessage.contains("(1,10)"))
    val e3 = intercept[IllegalArgumentException](
      wh.deleteWhereDv("dim/pp", ppParentS,
        Seq(ColEq("prod_id", 1L), ColEq("prov_id", 10L))))
    assert(e3.getMessage.contains("RESTRICT"))
    // the other pair of the same product, (1,20), is unreferenced — frees
    assert(wh.deleteWhereDv("dim/pp", ppParentS,
      Seq(ColEq("prod_id", 1L), ColEq("prov_id", 20L))).deleted == 1L)
    // declare-time validation refuses an existing orphan PAIR
    val wh2 = newWh()
    wh2.append("dim/pp", Seq((1L, 10L, "a")).toDF("prod_id", "prov_id", "nm").coalesce(1))
    wh2.append("fact/price", Seq((1L, Some(1L), Some(99L)))
      .toDF("id", "prod_ref", "prov_ref").coalesce(1))
    val e4 = intercept[IllegalArgumentException](
      wh2.addForeignKey("fact/price", Seq("prod_ref", "prov_ref"), "dim/pp",
        Seq("prod_id", "prov_id"), "fk"))
    assert(e4.getMessage.contains("existing"))
    // shape errors refuse loudly
    intercept[IllegalArgumentException](
      wh2.addForeignKey("fact/price", Seq("prod_ref"), "dim/pp",
        Seq("prod_id", "prov_id"), "fk_bad"))
  }

  test("composite FK races close the probe-to-publish window in both directions") {
    // direction 1: child insert racing a parent DV delete aborts the
    // delete (child freeze pin), then the retry refuses properly
    val dir = Files.createTempDirectory("graft-fk-crace-")
    val wh = new AtomicWarehouse(spark, dir.toString)
    val wh2 = new AtomicWarehouse(spark, dir.toString)
    wh.append("dim/pp", Seq((1L, 10L, "a"), (2L, 20L, "b"))
      .toDF("prod_id", "prov_id", "nm").coalesce(1))
    wh.addForeignKey("fact/price", Seq("prod_ref", "prov_ref"), "dim/pp",
      Seq("prod_id", "prov_id"), "fk_pp")
    wh.append("fact/price", Seq((100L, Some(2L), Some(20L)))
      .toDF("id", "prod_ref", "prov_ref").coalesce(1))
    val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[IllegalArgumentException](
      wh.deleteWhereDv("dim/pp", ppParentS,
        Seq(ColEq("prod_id", 1L), ColEq("prov_id", 10L)),
        alsoInTx = _ => if (injected.compareAndSet(false, true))
          wh2.append("fact/price", Seq((101L, Some(1L), Some(10L)))
            .toDF("id", "prod_ref", "prov_ref"))))
    assert(e.getMessage.contains("RESTRICT"), e.getMessage)
    assert(injected.get(), "fixture: the racing insert must have run")
    assert(wh.read("dim/pp", ppParentS).count() == 2 &&
      wh.read("fact/price", ppChildS).count() == 2, "orphan or lost row")
    // direction 2: a parent DV delete racing a child-insert transaction
    // aborts the child publish (parent pin)
    intercept[java.util.ConcurrentModificationException](
      wh.atomically { w =>
        w.append("fact/price", Seq((102L, Some(2L), Some(20L)))
          .toDF("id", "prod_ref", "prov_ref"))
        // un-referenced pair (1,10)? no — 101 references it now; delete the
        // one pair nothing references after removing 101's row first
        wh2.deleteWhere("fact/price", ppChildS, Seq(ColEq("id", 101L)))
        wh2.deleteWhereDv("dim/pp", ppParentS,
          Seq(ColEq("prod_id", 1L), ColEq("prov_id", 10L)))
      })
    assert(wh.scanWhere("fact/price", ppChildS, Seq(ColEq("id", 102L))).count() == 0,
      "orphan-window child insert leaked")
    // converged state: retry lands because (2,20) is still live
    wh.append("fact/price", Seq((102L, Some(2L), Some(20L)))
      .toDF("id", "prod_ref", "prov_ref"))
    // and a dangling pair still refuses after the dust settles
    intercept[IllegalArgumentException](
      wh.append("fact/price", Seq((103L, Some(1L), Some(10L)))
        .toDF("id", "prod_ref", "prov_ref")))
  }

  test("renameColumn follows composite FK descriptors on both sides") {
    val wh = seededPair()
    wh.append("fact/price", Seq((100L, Some(1L), Some(10L)))
      .toDF("id", "prod_ref", "prov_ref").coalesce(1))
    wh.renameColumn("dim/pp", "prov_id", "provider_id")
    wh.renameColumn("fact/price", "prod_ref", "product_ref")
    assert(wh.foreignKeysOf("fact/price") == Map("fk_pp" ->
      ((Seq("product_ref", "prov_ref"), "dim/pp", Seq("prod_id", "provider_id")))))
    // enforcement still tuple-exact under the new names
    intercept[IllegalArgumentException](
      wh.append("fact/price", Seq((101L, Some(2L), Some(20L)))
        .toDF("id", "product_ref", "prov_ref")))
    // dropping any tuple column refuses
    intercept[IllegalArgumentException](wh.dropColumn("dim/pp", "provider_id"))
    intercept[IllegalArgumentException](wh.dropColumn("fact/price", "prov_ref"))
  }

  test("declarations fold, round-trip restore, and drop cleanly") {
    val dir = Files.createTempDirectory("graft-fk-fold-").toString
    val wh = new AtomicWarehouse(spark, dir, logFoldEvery = 4)
    wh.append("dim/provider", Seq((1L, "a")).toDF("p_id", "p_name").coalesce(1))
    wh.addForeignKey("fact/product", "p_ref", "dim/provider", "p_id", "fk_provider")
    (0 until 6).foreach(i => wh.append("dim/provider",
      Seq((10L + i, "x")).toDF("p_id", "p_name").coalesce(1))) // cross the fold
    val wh2 = new AtomicWarehouse(spark, dir)
    assert(wh2.foreignKeysOf("fact/product")
      == Map("fk_provider" -> ((Seq("p_ref"), "dim/provider", Seq("p_id")))))
    assert(wh2.describe("fact/product").foreignKeys
      == Map("fk_provider" -> "p_ref -> dim/provider.p_id"))
    intercept[IllegalArgumentException](
      wh2.append("fact/product", Seq((1L, Some(999L))).toDF("c_id", "p_ref")))
    wh2.dropForeignKey("fact/product", "fk_provider")
    wh2.append("fact/product", Seq((1L, Some(999L))).toDF("c_id", "p_ref"))
    assert(wh2.read("fact/product", childS).count() == 1)
  }
}
