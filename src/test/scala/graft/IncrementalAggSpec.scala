package graft

import java.nio.file.Files

import graft.operators.IncrementalAgg
import graft.sources.AtomicWarehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The IVM identity end-to-end: incremental folds over CDC windows equal a
  * one-shot aggregate, invalidation rebuilds, null groups merge null-safe.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val srcSchema = StructType(Seq(
    StructField("k", StringType, nullable = true),
    StructField("x", LongType, nullable = false)))

  private def mk(rows: (String, Long)*): DataFrame = rows.toDF("k", "x")

  private def fresh(): (AtomicWarehouse, IncrementalAgg) = {
    val wh = new AtomicWarehouse(spark,
      Files.createTempDirectory("graft-ivm-").toString)
    (wh, new IncrementalAgg(wh, "t", "src", srcSchema,
      Seq("k"), Seq("sum_x" -> col("x"))))
  }

  private def stateOf(agg: IncrementalAgg): Map[Option[String], (Long, Long)] =
    agg.state().collect().map(r =>
      Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("incremental folds ≡ one-shot aggregate; null group keys merge null-safe") {
    val (wh, agg) = fresh()
    assert(agg.state().isEmpty && agg.cursor() == 0)
    wh.append("src", mk(("a", 1L), ("b", 10L), (null, 100L)))
    assert(agg.refresh() == 1)
    assert(stateOf(agg) == Map(Some("a") -> ((1L, 1L)), Some("b") -> ((1L, 10L)),
      None -> ((1L, 100L))))
    // second delta touches an existing group, a fresh group, and null again —
    // the null group must MERGE (null-safe join), not duplicate
    wh.append("src", mk(("a", 2L), ("c", 5L), (null, 200L)))
    agg.refresh()
    assert(stateOf(agg) == Map(Some("a") -> ((2L, 3L)), Some("b") -> ((1L, 10L)),
      Some("c") -> ((1L, 5L)), None -> ((2L, 300L))))
    // refresh with no SOURCE movement publishes nothing (its own prior
    // state/cursor commit must not count as movement — fixpoint, not Zeno)
    val head = wh.versions().last
    val cur = agg.cursor()
    assert(agg.refresh() == cur && wh.versions().last == head)
    // commits to OTHER tables are likewise not source movement
    wh.append("other", mk(("z", 0L)))
    assert(agg.refresh() == cur && wh.versions().last == head + 1)
    assert(stateOf(agg)(Some("a")) == ((2L, 3L)))
    // and the next real source append folds exactly once
    wh.append("src", mk(("a", 4L)))
    agg.refresh()
    assert(stateOf(agg)(Some("a")) == ((3L, 7L)))
  }

  test("row-level DML folds as retractions via the change feed — no rebuild needed") {
    val (wh, agg) = fresh()
    wh.setChangeFeed("src", on = true)
    wh.append("src", mk(("a", 1L), ("a", 2L), ("b", 10L), ("c", 100L)).coalesce(1))
    agg.refresh()
    assert(stateOf(agg) == Map(Some("a") -> ((2L, 3L)), Some("b") -> ((1L, 10L)),
      Some("c") -> ((1L, 100L))))
    // a window mixing an append, an update (retract pre + assert post), a
    // delete, and a merge — appendsBetween refuses all of it; the feed folds
    wh.append("src", mk(("b", 20L)).coalesce(1))
    wh.updateWhere("src", srcSchema,
      Seq(graft.sources.ColEq("x", 2L)), Seq("x" -> lit(5L)))
    wh.deleteWhere("src", srcSchema, Seq(graft.sources.ColEq("k", "c")))
    wh.mergeInto("src", srcSchema, mk(("d", 7L)), Seq("k"))
    agg.refresh()
    // group c retracted to zero rows and LEFT the state, like a one-shot agg
    assert(stateOf(agg) == Map(Some("a") -> ((2L, 6L)), Some("b") -> ((2L, 30L)),
      Some("d") -> ((1L, 7L))), s"got ${stateOf(agg)}")
    // ≡ one-shot over the live source
    val oneShot = wh.read("src", srcSchema).groupBy(col("k"))
      .agg(count(lit(1)), sum(col("x"))).collect()
      .map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stateOf(agg) == oneShot)
    // maintenance in the next window is feed-transparent: no state movement
    wh.compactSmall("src", srcSchema, minBytes = 1L << 20)
    agg.refresh()
    assert(stateOf(agg) == oneShot)
  }

  test("a truncate in the window invalidates: rebuild as-of head, then deltas resume") {
    val (wh, agg) = fresh()
    wh.append("src", mk(("a", 1L), ("b", 2L)))
    agg.refresh()
    // replace = truncate → appendsBetween refuses → rebuild path
    wh.replace("src", mk(("a", 7L)))
    agg.refresh()
    assert(stateOf(agg) == Map(Some("a") -> ((1L, 7L))))
    // and the cursor is exact: the next delta fold sees only the new append
    wh.append("src", mk(("a", 1L), ("d", 4L)))
    agg.refresh()
    assert(stateOf(agg) == Map(Some("a") -> ((2L, 8L)), Some("d") -> ((1L, 4L))))
  }
}
