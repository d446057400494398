package graft

import java.nio.file.Files

import graft.sources.{AtomicWarehouse, ColEq}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Table CHECK constraints (the Delta `ADD CONSTRAINT CHECK` surface):
  * declared once, enforced on EVERY batch of rows entering the table —
  * append, replace, DML post-images — with SQL CHECK semantics (NULL
  * passes, only FALSE violates). Existing rows are validated at declare
  * time, so the invariant holds table-wide from the moment the declare
  * commits, and a refused write commits NOTHING (the transaction is the
  * enforcement boundary).
  */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private val kv = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("price", LongType, nullable = true),
    StructField("status", StringType, nullable = true)))

  private def newWh() =
    new AtomicWarehouse(spark, Files.createTempDirectory("graft-constraint-").toString)

  private def rows(t: (Long, java.lang.Long, String)*) =
    t.toSeq.toDF("id", "price", "status")

  test("append enforces; a violating batch refuses atomically, table untouched") {
    val wh = newWh()
    wh.addConstraint("t", "price_positive", "price > 0", kv)
    wh.addConstraint("t", "status_valid", "status IN ('O','F','P')", kv)
    wh.append("t", rows((1L, 10L, "O"), (2L, 20L, "F")))
    val e = intercept[IllegalArgumentException](
      wh.append("t", rows((3L, -5L, "O"), (4L, 30L, "F"))))
    assert(e.getMessage.contains("price_positive") && e.getMessage.contains("1 row"))
    assert(wh.read("t", kv).count() == 2)
    // multi-table transaction: the GOOD table's write dies with the bad one
    val e2 = intercept[IllegalArgumentException](wh.atomically { w =>
      w.append("other", rows((9L, 1L, "O")))
      w.append("t", rows((5L, 0L, "O"))) // > 0 is strict
    })
    assert(e2.getMessage.contains("price_positive"))
    assert(!wh.exists("other"), "refused transaction leaked a sibling write")
  }

  test("SQL CHECK null semantics: NULL passes, IS NOT NULL refuses it") {
    val wh = newWh()
    wh.addConstraint("t", "price_positive", "price > 0", kv)
    wh.append("t", rows((1L, null, "O"))) // unknown → pass, the SQL standard
    assert(wh.read("t", kv).count() == 1)
    // declare-time validation catches the existing null
    val e = intercept[IllegalArgumentException](
      wh.addConstraint("t", "price_present", "price IS NOT NULL", kv))
    assert(e.getMessage.contains("existing"))
    // on a clean table the presence constraint declares and enforces
    wh.append("u", rows((1L, 2L, "O")))
    wh.addConstraint("u", "price_present", "price IS NOT NULL", kv)
    val e2 = intercept[IllegalArgumentException](
      wh.append("u", rows((2L, null, "O"))))
    assert(e2.getMessage.contains("price_present"))
  }

  test("declare-time validation refuses when existing rows violate") {
    val wh = newWh()
    wh.append("t", rows((1L, -1L, "O")))
    val e = intercept[IllegalArgumentException](
      wh.addConstraint("t", "price_positive", "price > 0", kv))
    assert(e.getMessage.contains("existing"))
    assert(wh.constraintsOf("t").isEmpty)
  }

  test("row-level DML post-images are enforced; deletes are not blocked") {
    val wh = newWh()
    wh.addConstraint("t", "price_positive", "price > 0", kv)
    wh.append("t", rows((1L, 10L, "O"), (2L, 20L, "F")))
    val e = intercept[IllegalArgumentException](
      wh.updateWhere("t", kv, Seq(ColEq("id", 1L)),
        Seq("price" -> lit(-99L))))
    assert(e.getMessage.contains("price_positive"))
    assert(wh.scanWhere("t", kv, Seq(ColEq("id", 1L)))
      .head().getLong(1) == 10L, "refused UPDATE mutated the row")
    wh.updateWhere("t", kv, Seq(ColEq("id", 1L)), Seq("price" -> lit(15L)))
    assert(wh.scanWhere("t", kv, Seq(ColEq("id", 1L))).head().getLong(1) == 15L)
    // MERGE: a violating source row refuses the whole merge
    val e2 = intercept[IllegalArgumentException](
      wh.mergeInto("t", kv, rows((2L, -7L, "F"), (3L, 30L, "P")), Seq("id")))
    assert(e2.getMessage.contains("price_positive"))
    assert(wh.read("t", kv).count() == 2, "refused MERGE half-applied")
    // deletes only remove rows — never constraint-checked
    wh.deleteWhere("t", kv, Seq(ColEq("id", 2L)))
    assert(wh.read("t", kv).count() == 1)
  }

  test("drop lifts enforcement; delete(table) clears declarations") {
    val wh = newWh()
    wh.addConstraint("t", "price_positive", "price > 0", kv)
    wh.append("t", rows((1L, 1L, "O")))
    wh.dropConstraint("t", "price_positive")
    wh.append("t", rows((2L, -1L, "O"))) // no longer enforced
    assert(wh.read("t", kv).count() == 2)
    wh.addConstraint("u", "pp", "price > 0", kv)
    wh.delete("u")
    assert(wh.constraintsOf("u").isEmpty,
      "delete(table) must clear constraint declarations")
    wh.append("u", rows((1L, -1L, "O"))) // re-created table starts clean
  }

  test("schema evolution interacts safely: rename follows FK/UNIQUE, refuses on CHECK; drop refuses on any reference") {
    val wh = newWh()
    wh.append("p", rows((1L, 5L, "O")).coalesce(1))
    wh.append("c", rows((1L, 1L, "O")).coalesce(1))
    wh.addConstraint("p", "price_positive", "price > 0", kv)
    wh.addForeignKey("c", "price", "p", "id", "fk_pid")
    wh.addUniqueKey("p", "id", "pk")
    // rename a CHECK-referenced column refuses with instructions
    val e = intercept[IllegalArgumentException](wh.renameColumn("p", "price", "cost"))
    assert(e.getMessage.contains("price_positive"))
    // rename of the FK parent key and UNIQUE column FOLLOWS the rename
    wh.renameColumn("p", "id", "pid")
    assert(wh.foreignKeysOf("c") == Map("fk_pid" -> ((Seq("price"), "p", Seq("pid")))))
    assert(wh.uniquesOf("p") == Map("pk" -> "pid"))
    // enforcement still works under the new name, both directions
    val ps = StructType(Seq(
      StructField("pid", LongType, nullable = false),
      StructField("price", LongType, nullable = true),
      StructField("status", StringType, nullable = true)))
    intercept[IllegalArgumentException](
      wh.append("p", Seq((1L, 6L, "O")).toDF("pid", "price", "status"))) // dup pid
    intercept[IllegalArgumentException](
      wh.append("c", rows((2L, 9L, "O")))) // dangling ref under renamed parent key
    // rename of the FK CHILD column follows too
    wh.renameColumn("c", "price", "p_ref")
    assert(wh.foreignKeysOf("c") == Map("fk_pid" -> ((Seq("p_ref"), "p", Seq("pid")))))
    // drop of any referenced column refuses
    intercept[IllegalArgumentException](wh.dropColumn("p", "pid"))
    intercept[IllegalArgumentException](wh.dropColumn("c", "p_ref"))
    intercept[IllegalArgumentException](wh.dropColumn("p", "price"))
    // after dropping the declarations, the columns free up
    wh.dropConstraint("p", "price_positive")
    wh.dropColumn("p", "price")
    assert(wh.constraintsOf("p").isEmpty)
  }

  test("declarations survive truncate, log folds, and restore round-trips") {
    val dir = Files.createTempDirectory("graft-constraint-fold-").toString
    val wh = new AtomicWarehouse(spark, dir, logFoldEvery = 4)
    wh.append("t", rows((1L, 1L, "O"))) // v1: the pre-declaration era
    val preDecl = wh.versions().last
    wh.addConstraint("t", "price_positive", "price > 0", kv)
    wh.atomically { w => w.replace("t", rows((2L, 2L, "O"))) } // truncate-within-tx
    (0 until 5).foreach(i => wh.append("t", rows((10L + i, 5L, "O")))) // cross fold
    val wh2 = new AtomicWarehouse(spark, dir) // fresh fold from the snapshot
    assert(wh2.constraintsOf("t") == Map("price_positive" -> "price > 0"),
      "fold or truncate dropped the declaration")
    intercept[IllegalArgumentException](wh2.append("t", rows((99L, -1L, "O"))))
    assert(wh2.describe("t").constraints.keySet == Set("price_positive"))
    // restore to the pre-declaration era clears; restoring forward re-arms
    val head = wh2.versions().last
    wh2.restore("t", preDecl)
    assert(wh2.constraintsOf("t").isEmpty, "restore kept a post-era constraint")
    wh2.append("t", rows((99L, -1L, "O"))) // era had no constraint
    wh2.deleteWhere("t", kv, Seq(ColEq("id", 99L)))
    wh2.restore("t", head)
    assert(wh2.constraintsOf("t") == Map("price_positive" -> "price > 0"))
  }
}
