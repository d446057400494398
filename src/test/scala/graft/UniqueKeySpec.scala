package graft

import java.nio.file.Files

import graft.sources.{AtomicWarehouse, ColEq}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** UNIQUE constraints — the third invariant beside CHECK and FOREIGN KEY,
  * closing the FK contract's open edge (parent keys assumed unique).
  * Enforcement is batch-sized: within-batch duplicates via one aggregate,
  * batch-vs-table via the point probe over the files the write does NOT
  * replace — a DML rewrite never self-collides with its own pre-image,
  * and a merge's excluded candidate set provably holds every file sharing
  * its keys. Multiple NULLs coexist (the SQL rule).
  */
class UniqueKeySpec extends SparkSpec {
  import spark.implicits._

  private val kv = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("v", StringType, nullable = true)))

  private def newWh() =
    new AtomicWarehouse(spark, Files.createTempDirectory("graft-uniq-").toString)

  private def rows(t: (java.lang.Long, String)*) = t.toSeq.toDF("id", "v")

  test("appends refuse within-batch and cross-batch duplicates; NULLs coexist") {
    val wh = newWh()
    wh.addUniqueKey("t", "id", "pk")
    wh.append("t", rows((1L, "a"), (2L, "b"), (null, "n1"), (null, "n2")))
    val e = intercept[IllegalArgumentException](
      wh.append("t", rows((3L, "c"), (3L, "c2"))))
    assert(e.getMessage.contains("within this write"))
    val e2 = intercept[IllegalArgumentException](wh.append("t", rows((2L, "dup"))))
    assert(e2.getMessage.contains("already present"))
    wh.append("t", rows((3L, "c"), (null, "n3"))) // fresh key + another NULL
    assert(wh.read("t", kv).count() == 6)
  }

  test("declare-time validation refuses existing duplicates") {
    val wh = newWh()
    wh.append("t", rows((1L, "a"), (1L, "b")).coalesce(1))
    val e = intercept[IllegalArgumentException](wh.addUniqueKey("t", "id", "pk"))
    assert(e.getMessage.contains("existing"))
    assert(wh.uniquesOf("t").isEmpty)
  }

  test("DML rewrites never self-collide; re-keying onto a live key refuses") {
    val wh = newWh()
    wh.addUniqueKey("t", "id", "pk")
    // two files so the rewrite excludes one and probes the other
    wh.append("t", rows((1L, "a"), (2L, "b")).coalesce(1))
    wh.append("t", rows((3L, "c"), (4L, "d")).coalesce(1))
    // value update keeps keys — must not collide with its own pre-image
    wh.updateWhere("t", kv, Seq(ColEq("id", 1L)), Seq("v" -> lit("a2")))
    // re-key within the rewritten file set: 1 -> 2 collides IN the batch
    val e = intercept[IllegalArgumentException](
      wh.updateWhere("t", kv, Seq(ColEq("id", 1L)), Seq("id" -> lit(2L))))
    assert(e.getMessage.contains("pk"))
    // re-key onto a key in an UNTOUCHED file: caught by the outside probe
    val e2 = intercept[IllegalArgumentException](
      wh.updateWhere("t", kv, Seq(ColEq("id", 1L)), Seq("id" -> lit(4L))))
    assert(e2.getMessage.contains("already present"))
    // re-key to a fresh value lands
    assert(wh.updateWhere("t", kv, Seq(ColEq("id", 1L)), Seq("id" -> lit(9L))) == 1L)
    // merge upserts on the unique key never false-refuse (candidates hold
    // every file sharing the keys), and fresh inserts stay unique-checked
    wh.mergeInto("t", kv, rows((2L, "b2"), (10L, "j")), Seq("id"))
    assert(wh.read("t", kv).count() == 5)
  }

  test("replace re-baselines: only the within-batch check applies") {
    val wh = newWh()
    wh.addUniqueKey("t", "id", "pk")
    wh.append("t", rows((1L, "a")))
    wh.replace("t", rows((1L, "fresh"), (2L, "b"))) // old key 1 is gone with the truncate
    assert(wh.read("t", kv).count() == 2)
    intercept[IllegalArgumentException](
      wh.replace("t", rows((5L, "x"), (5L, "y"))))
  }

  test("composite keys: the tuple is unique, partial-null rows exempt") {
    val wh = newWh()
    val pp = Seq((1L, 10L, "a"), (1L, 11L, "b"), (2L, 10L, "c"))
      .toDF("prov", "prod", "v")
    wh.append("pp", pp.coalesce(1))
    wh.addUniqueKey("pp", Seq("prov", "prod"), "pk_pair")
    // same prov, fresh prod: fine; the exact pair: refused
    wh.append("pp", Seq((1L, 12L, "d")).toDF("prov", "prod", "v"))
    val e = intercept[IllegalArgumentException](
      wh.append("pp", Seq((1L, 10L, "dup")).toDF("prov", "prod", "v")))
    assert(e.getMessage.contains("pk_pair"))
    // a null in EITHER key column exempts the row (SQL), repeatedly
    val withNull = Seq((java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], "n"))
      .toDF("prov", "prod", "v")
    wh.append("pp", withNull)
    wh.append("pp", withNull)
    // within-batch pair duplicate refuses
    intercept[IllegalArgumentException](
      wh.append("pp", Seq((9L, 9L, "x"), (9L, 9L, "y")).toDF("prov", "prod", "v")))
    // declare-time validation sees tuple duplicates
    wh.append("dup2", Seq((1L, 1L, "x"), (1L, 1L, "y")).toDF("prov", "prod", "v").coalesce(1))
    intercept[IllegalArgumentException](
      wh.addUniqueKey("dup2", Seq("prov", "prod"), "pk"))
    // rename follows a composite member; drop refuses on it
    wh.renameColumn("pp", "prod", "product_id")
    assert(wh.uniquesOf("pp") == Map("pk_pair" -> "prov,product_id"))
    intercept[IllegalArgumentException](wh.dropColumn("pp", "product_id"))
  }

  test("declarations fold, drop lifts, delete(table) clears") {
    val dir = Files.createTempDirectory("graft-uniq-fold-").toString
    val wh = new AtomicWarehouse(spark, dir, logFoldEvery = 4)
    wh.addUniqueKey("t", "id", "pk")
    (0 until 6).foreach(i => wh.append("t", rows((i.toLong, "x")).coalesce(1)))
    val wh2 = new AtomicWarehouse(spark, dir)
    assert(wh2.uniquesOf("t") == Map("pk" -> "id"))
    assert(wh2.describe("t").uniqueKeys == Map("pk" -> "id"))
    intercept[IllegalArgumentException](wh2.append("t", rows((3L, "dup"))))
    wh2.dropUniqueKey("t", "pk")
    wh2.append("t", rows((3L, "dup")))
    wh2.delete("t")
    wh2.append("t", rows((7L, "a"), (7L, "b"))) // re-created table starts clean
    assert(wh2.uniquesOf("t").isEmpty)
  }

  test("an OVER-CAP batch (distincts past the probe limit) never reaches " +
      "collect_set: the full-probe fallback stays exact both ways") {
    // regression pin for the r14 ADVICE fix: distinct COUNTS are computed
    // first (one partially-aggregated pass) so a column whose distinct set
    // exceeds the 10k probe cap never materializes in collect_set — this
    // case drives that path end-to-end: 10_001 distinct keys in one batch
    val wh = newWh()
    wh.append("t", (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    wh.addUniqueKey("t", "id", "pk")
    // over-cap batch colliding with ONE existing key: the fallback (whole
    // remain-set join) must still refuse — over-cap is not a blind spot
    val colliding = ((100L until 10100L) :+ 42L).map(i => (i, s"w$i")).toDF("id", "v")
    val e = intercept[IllegalArgumentException](wh.append("t", colliding))
    assert(e.getMessage.contains("already present"), e.getMessage)
    assert(wh.read("t", kv).count() == 100, "refused over-cap batch leaked")
    // disjoint over-cap batch lands
    wh.append("t", (100L until 10201L).map(i => (i, s"w$i")).toDF("id", "v"))
    assert(wh.read("t", kv).count() == 100L + 10101L)
  }
}
