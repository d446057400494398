package graft

import org.apache.spark.sql.functions._

/** Approximate-distinct sketches — the 100 TB path for the distinct counts
  * that exact aggregation can't stream (unbounded per-group state) and
  * `q10_stream` therefore omits. Two properties matter at scale:
  * bounded error, and MERGEABILITY (per-partition sketches combine into the
  * global answer without a second scan — the partial-agg contract).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def ids = spark.range(0, 200000)
    .select((col("id") % 37213).as("k"), (col("id") % 4).as("grp"))

  test("approx_count_distinct lands within its error bound") {
    val approx = ids.select(approx_count_distinct(col("k"), 0.02)).as[Long].head()
    assert(math.abs(approx - 37213.0) / 37213.0 < 0.05,
      s"approx=$approx vs exact=37213")
  }

  test("HLL sketches merge: per-group sketches union to the global estimate") {
    val perGroup = ids.groupBy(col("grp"))
      .agg(hll_sketch_agg(col("k")).as("sk"))
    val merged = perGroup
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .as[Long].head()
    val direct = ids.agg(hll_sketch_estimate(hll_sketch_agg(col("k"))))
      .as[Long].head()
    // mergeability: unioning partial sketches gives the SAME estimate as
    // one global sketch (not merely a close one) — the property that makes
    // distinct-count a single-pass map-side aggregation on a cluster
    assert(merged == direct, s"merged=$merged direct=$direct")
    assert(math.abs(direct - 37213.0) / 37213.0 < 0.05)
  }

  test("theta set algebra: overlap/union/difference estimates on known sets") {
    // A = [0, 30000), B = [20000, 50000): inter 10000, union 50000, A∖B 20000
    val a = spark.range(0, 30000).toDF("k")
    val b = spark.range(20000, 50000).toDF("k")
    val r = graft.operators.SketchSetOps.overlap(a, "k", b, "k").head()
    val (ea, eb, ei, eu, ed) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    def within(est: Long, exact: Double) = math.abs(est - exact) / exact < 0.06
    assert(within(ea, 30000) && within(eb, 30000), s"sides: $ea / $eb")
    assert(within(ei, 10000), s"intersection: $ei")
    assert(within(eu, 50000), s"union: $eu")
    assert(within(ed, 20000), s"difference: $ed")
    // null keys are not set members (the tagged-union build depends on it)
    val withNulls = a.select(when(col("k") < 15000, col("k")).as("k"))
    val r2 = graft.operators.SketchSetOps.overlap(withNulls, "k", b, "k").head()
    assert(within(r2.getLong(0), 15000), s"null keys must not count: ${r2.getLong(0)}")
    assert(r2.getLong(2) < 1500, s"no overlap expected: ${r2.getLong(2)}")
  }

  private val kv = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("grp",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("uid",
      org.apache.spark.sql.types.LongType, nullable = false)))

  private def estMap(sd: graft.operators.SketchDistinct): Map[String, Long] =
    sd.estimate().collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def within(est: Long, exact: Long): Boolean =
    math.abs(est - exact.toDouble) / math.max(exact, 1L) < 0.05

  test("SketchDistinct MV: append-only windows union delta sketches into the state") {
    val wh = new graft.sources.AtomicWarehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-skmv-").toString)
    def rows(g: String, lo: Long, hi: Long) =
      (lo until hi).map(i => (g, i)).toDF("grp", "uid")
    wh.append("src", rows("a", 0, 3000).unionByName(rows("b", 0, 500)))
    val sd = new graft.operators.SketchDistinct(wh, "d", "src", kv, Seq("grp"), "uid")
    sd.refresh()
    val e1 = estMap(sd)
    assert(within(e1("a"), 3000) && within(e1("b"), 500), s"got $e1")
    // second window overlaps the first — DISTINCT must not double-count
    wh.append("src", rows("a", 2000, 5000).unionByName(rows("c", 0, 100)))
    sd.refresh()
    val e2 = estMap(sd)
    assert(within(e2("a"), 5000) && within(e2("b"), 500) && within(e2("c"), 100),
      s"got $e2")
    // an empty window publishes nothing
    val cur = sd.cursor()
    assert(sd.refresh() == cur)
  }

  test("SketchQuantile MV: incremental quantiles hold rank error; retraction recomputes") {
    val wh = new graft.sources.AtomicWarehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-skq-").toString)
    wh.setChangeFeed("src", on = true)
    def rows(g: String, lo: Long, hi: Long) =
      (lo until hi).map(i => (g, i)).toDF("grp", "uid")
    wh.append("src", rows("a", 1, 10001).unionByName(rows("b", 1, 1001)))
    val sq = new graft.operators.SketchQuantile(wh, "q", "src", kv, Seq("grp"), "uid")
    sq.refresh()
    wh.append("src", rows("a", 10001, 20001))
    sq.refresh() // append-only merge path
    def p50(g: String): Double = sq.quantiles(Seq(0.5))
      .filter(col("grp") === g).head().getDouble(1)
    // uniform 1..20000: value ≈ rank × 20000, KLL rank error ~1.65% at k=200
    assert(math.abs(p50("a") - 10000) < 20000 * 0.03, s"got ${p50("a")}")
    assert(math.abs(p50("b") - 500) < 1000 * 0.05, s"got ${p50("b")}")
    // observation counts ride the sketches exactly
    val ns = sq.counts().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ns("a") == 20000L && ns("b") == 1000L, s"got $ns")
    val skB = sq.state().filter(col("grp") === "b")
      .select(col("sk")).head().getAs[Array[Byte]](0)
    // retract a's top quarter: a recomputes from the base, b byte-identical
    wh.deleteWhere("src", kv, Seq(graft.sources.ColEq("grp", "a"),
      graft.sources.ColGt("uid", 15000L)))
    sq.refresh()
    assert(math.abs(p50("a") - 7500) < 15000 * 0.03, s"got ${p50("a")}")
    val skB2 = sq.state().filter(col("grp") === "b")
      .select(col("sk")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(skB, skB2),
      "group b was not retracted — its sketch must not be recomputed")
  }

  test("SketchDistinct MV: a retraction recomputes ONLY the affected group") {
    val wh = new graft.sources.AtomicWarehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-skmv2-").toString)
    wh.setChangeFeed("src", on = true)
    def rows(g: String, lo: Long, hi: Long) =
      (lo until hi).map(i => (g, i)).toDF("grp", "uid")
    wh.append("src", rows("a", 0, 2000).unionByName(rows("b", 0, 1000))
      .unionByName(rows("c", 0, 10)))
    val sd = new graft.operators.SketchDistinct(wh, "d", "src", kv, Seq("grp"), "uid")
    sd.refresh()
    val skA = sd.state().filter(col("grp") === "a")
      .select(col("sk")).head().getAs[Array[Byte]](0)
    // delete half of b and all of c; sketches can't forget, so b recomputes
    // from the base, c's group leaves the view — and a's sketch must be
    // BYTE-IDENTICAL (untouched groups never recompute)
    wh.deleteWhere("src", kv, Seq(graft.sources.ColEq("grp", "b"),
      graft.sources.ColGe("uid", 500L)))
    wh.deleteWhere("src", kv, Seq(graft.sources.ColEq("grp", "c")))
    sd.refresh()
    val e = estMap(sd)
    assert(within(e("a"), 2000) && within(e("b"), 500) && !e.contains("c"), s"got $e")
    val skA2 = sd.state().filter(col("grp") === "a")
      .select(col("sk")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(skA, skA2),
      "group a was not retracted — its sketch must not be recomputed")
    // inserts arriving in the SAME window as a retraction still land
    wh.deleteWhere("src", kv, Seq(graft.sources.ColEq("grp", "b"),
      graft.sources.ColGe("uid", 400L)))
    wh.append("src", rows("d", 0, 300))
    sd.refresh()
    val e2 = estMap(sd)
    assert(within(e2("b"), 400) && within(e2("d"), 300) && within(e2("a"), 2000),
      s"got $e2")
  }

  test("SketchDistinct MV: the NULL-keyed group survives retraction windows") {
    // groupBy keeps NULL as a real group, so the retraction path's key
    // joins must be null-safe: with plain equality the semi (recompute)
    // and anti (other-inserts) sides never match the null tuple while the
    // untouched-state anti-join (<=>) removes its sketch — the group's
    // base silently vanishes
    val kvN = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("uid",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val wh = new graft.sources.AtomicWarehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-skmv3-").toString)
    wh.setChangeFeed("src", on = true)
    def rows(g: Option[String], lo: Long, hi: Long) =
      (lo until hi).map(i => (g, i)).toDF("grp", "uid")
    wh.append("src", rows(Some("a"), 0, 1000).unionByName(rows(None, 0, 1000)))
    val sd = new graft.operators.SketchDistinct(wh, "d", "src", kvN, Seq("grp"), "uid")
    sd.refresh()
    def ests = sd.estimate().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(within(ests(Some("a")), 1000) && within(ests(None), 1000), s"got $ests")
    // retract half of BOTH groups (predicate touches the null group too),
    // and land same-window inserts into the null group
    wh.deleteWhere("src", kvN, Seq(graft.sources.ColGe("uid", 500L)))
    wh.append("src", rows(None, 2000, 2300))
    sd.refresh()
    val e = ests
    assert(within(e(Some("a")), 500), s"got $e")
    assert(e.contains(None) && within(e(None), 800),
      s"null group lost its base through retraction: $e")
  }
}
