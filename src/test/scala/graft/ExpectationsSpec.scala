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
