package graft

import graft.operators.Expectations
import graft.operators.Expectations._
import org.apache.spark.sql.functions._

/** Row-level expectations: per-rule golden counts on a crafted frame, the
  * stated null semantics (range/set/pattern skip nulls; all-null unique
  * keys collide like GROUP BY), report ordering, and the enforce gate.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (Some(1L), Some(10.0), Some("ok-a"), Some("X")),
    (Some(2L), Some(-1.0), Some("ok-b"), Some("Y")),   // range violation
    (Some(2L), Some(5.0), Some("bad"), Some("X")),     // dup key + pattern violation
    (None, Some(200.0), None, None),                   // null key; range violation; nulls skip pattern/set
    (Some(4L), None, Some("ok-c"), Some("Z"))          // null range value skips
  ).map { case (k, v, s, c) =>
    (k.map(Long.box).orNull, v.map(Double.box).orNull, s.orNull, c.orNull)
  }.toDF("k", "v", "s", "c")

  test("golden counts per rule, declaration order, stated null semantics") {
    val ref = Seq(1L, 2L, 9L).toDF("rk")
    val got = Expectations.check(frame, Seq(
      NotNull("k"),
      InRange("v", 0, 100),
      Matches("s", "^ok-.*"),
      InSet("c", Seq("X", "Y")),
      Unique(Seq("k")),
      RefIn("k", ref, "rk")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == Seq(
      (0L, "not_null", "k", 1L, 5L, false),
      (1L, "in_range", "v", 2L, 5L, false),  // -1 and 200; null skips
      (2L, "matches", "s", 1L, 5L, false),   // "bad"; null skips
      (3L, "in_set", "c", 1L, 5L, false),    // "Z"; null skips
      (4L, "unique", "k", 1L, 5L, false),    // two k=2 rows → 1 extra
      (5L, "ref_in", "k", 1L, 5L, false)),   // k=4 absent from ref; null skips
      s"report mismatch: $got")
  }

  test("all-null unique keys collide into one group, like GROUP BY") {
    val d = Seq[(Option[Long], String)]((None, "a"), (None, "b"), (Some(1L), "c"))
      .map { case (k, s) => (k.map(Long.box).orNull, s) }.toDF("k", "s")
    val got = Expectations.check(d, Seq(Unique(Seq("k")))).head()
    assert(got.getLong(3) == 1L, "two all-null keys must count as one duplicate")
  }

  test("a clean table passes every rule; enforce throws only on failure") {
    val clean = Seq((1L, "A"), (2L, "B")).toDF("k", "s")
    val rep = Expectations.check(clean, Seq(NotNull("k"), Unique(Seq("k")),
      Matches("s", "^[A-Z]$")))
    assert(rep.filter(!col("pass")).isEmpty)
    Expectations.enforce(clean, Seq(NotNull("k"))) // no throw
    val e = intercept[IllegalArgumentException](
      Expectations.enforce(frame, Seq(NotNull("k"), InRange("v", 0, 100))))
    assert(e.getMessage.contains("not_null(k)=1") &&
      e.getMessage.contains("in_range(v)=2"), e.getMessage)
    intercept[IllegalArgumentException](Expectations.check(clean, Nil))
  }

  test("QualityMonitor: delta windows, quiet no-src windows, truncate rebase, replay no-op") {
    import graft.operators.QualityMonitor
    import graft.sources.AtomicWarehouse
    import java.nio.file.Files
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(StructField("k", LongType), StructField("s", StringType)))
    val wh = new AtomicWarehouse(spark, Files.createTempDirectory("graft-qmspec-").toString)
    val qm = new QualityMonitor(wh, "t", schema, Seq(NotNull("s")))
    def reports = qm.report().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(6), r.getLong(7)))
      .sortBy(_._2).toSeq

    assert(qm.refresh() == 0, "nothing committed yet")
    wh.append("t", Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("k", "s")) // v1
    assert(qm.refresh() == 1)                    // report commit = v2
    assert(reports == Seq((0L, 1L, false, 1L, 2L)), s"first window wrong: $reports")
    // re-refresh at a quiet head: the only newer commit is the monitor's own
    // report — no src rows, NO new commit (the cursor-table ratchet trap)
    val vBefore = wh.versions().size
    assert(qm.refresh() == 0 && reports.size == 1)
    assert(wh.versions().size == vBefore, "a no-op refresh must not commit")
    // commits to OTHER tables likewise measure nothing and commit nothing
    wh.append("u", Seq((9L, "z")).toDF("k", "s")) // v3
    assert(qm.refresh() == 0, "no-src window must not report")
    assert(reports.size == 1 && qm.cursor() == 1L)
    // a clean delta reports clean — only ITS rows measured
    wh.append("t", Seq((3L, "c")).toDF("k", "s")) // v4
    assert(qm.refresh() == 1)
    assert(reports.last == ((1L, 4L, false, 0L, 1L)), s"delta window wrong: $reports")
    // truncate in the window → rebase over the full as-of state, flagged
    wh.replace("t", Seq((1L, "a"), (3L, null.asInstanceOf[String])).toDF("k", "s")) // v6
    assert(qm.refresh() == 1)
    val rb = reports.last
    assert(rb._3 && rb._4 == 1L && rb._5 == 2L, s"rebase row wrong: $rb")
  }

  test("row-local rules fuse into one aggregate job over the frame") {
    // the fused pass means rule count does not multiply scans: all four
    // row-local rules resolve from ONE aggregate — assert via the listener
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    sc.addSparkListener(l)
    try {
      Expectations.check(frame, Seq(NotNull("k"), InRange("v", 0, 100),
        Matches("s", "^ok-.*"), InSet("c", Seq("X", "Y")))).collect()
      Thread.sleep(500) // listener bus drains asynchronously
      // one aggregate for the rules + one for the tiny report materialize
      assert(jobs.get() <= 3, s"row-local rules ran ${jobs.get()} jobs — not fused")
    } finally sc.removeSparkListener(l)
  }
}
