package graft

import graft.operators.TimeJoins
import org.apache.spark.sql.functions._

/** TimeJoins equivalence tests: the scale shapes (union+window as-of, bucketed
  * range join) must produce exactly the rows the naive inequality-join forms
  * produce — on hand-built edge fixtures (equal timestamps, no-match keys,
  * bucket boundaries) and on the real sf0.001 events table.
  */
class TimeJoinsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = SparkEntry.eventsTable(spark, "/root/testdata/sf0.001")
    .select(col("user_id"), expr("ts DIV 1000").as("us"), col("event_type"), col("value"))

  test("asOfJoin matches naive greatest-right-<=-left on edge fixture") {
    val left = Seq(
      (1L, 100L, "l1"), // exact-tie with a right row at 100
      (1L, 150L, "l2"), // between rights
      (1L, 10L, "l3"),  // before any right → null
      (2L, 500L, "l4"), // key with no right rows → null
      (3L, 70L, "l5")   // single right exactly at its ts
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 100L, "r100"),
      (1L, 90L, "r90"),
      (1L, 120L, "r120"),
      (3L, 70L, "r70")
    ).toDF("k", "ts", "v")

    val got = TimeJoins
      .asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("ts", "v"), "m_")
      .select("tag", "m_ts", "m_v")
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet

    assert(got === Set(
      ("l1", Some(100L), Some("r100")), // >= semantics: tie matches
      ("l2", Some(120L), Some("r120")),
      ("l3", None, None),
      ("l4", None, None),
      ("l5", Some(70L), Some("r70"))))
  }

  test("asOfJoin: null keys never match (left preserved, right dropped)") {
    val left = Seq((Option(1L), 100L, "l1"), (Option.empty[Long], 100L, "lnull"))
      .toDF("k", "ts", "tag")
    val right = Seq((Option(1L), 90L, "r1"), (Option.empty[Long], 90L, "rnull"))
      .toDF("k", "ts", "v")
    val got = TimeJoins
      .asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("v"), "m_")
      .select("tag", "m_v")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toSet
    // SQL equality: null key matches nothing — the null-key left row survives
    // unmatched instead of pairing with the null-key right row
    assert(got === Set(("l1", Some("r1")), ("lnull", None)))
  }

  test("asOfJoin matches naive max-right join on real events") {
    val purchases = events.filter($"event_type" === "purchase").select("user_id", "us")
    val clicks = events.filter($"event_type" === "click").select("user_id", "us")

    val fast = TimeJoins
      .asOfJoin(purchases, clicks, Seq("user_id"), "us", "us", Seq("us"), "click_")
      .select($"user_id", $"us", $"click_us")

    // naive: left join all earlier-or-equal clicks, take the max per purchase
    val naive = purchases
      .join(clicks.select($"user_id".as("cu"), $"us".as("c_us")),
        $"user_id" === $"cu" && $"c_us" <= $"us", "left")
      .groupBy($"user_id", $"us")
      .agg(max($"c_us").as("click_us"))

    assert(fast.count() === purchases.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("asOfJoinBucketed == asOfJoin on the edge fixture at several widths") {
    val left = Seq(
      (1L, 100L, "l1"), (1L, 150L, "l2"), (1L, 10L, "l3"),
      (2L, 500L, "l4"), (3L, 70L, "l5")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 100L, "r100"), (1L, 90L, "r90"), (1L, 120L, "r120"), (3L, 70L, "r70")
    ).toDF("k", "ts", "v")
    val want = Set(
      ("l1", Some(100L), Some("r100")), ("l2", Some(120L), Some("r120")),
      ("l3", None, None), ("l4", None, None), ("l5", Some(70L), Some("r70")))
    // width 1 (every row its own bucket: pure carry), 7 (boundaries straddle),
    // 1000 (single bucket: pure in-bucket window, == asOfJoin shape)
    Seq(1L, 7L, 1000L).foreach { w =>
      val got = TimeJoins
        .asOfJoinBucketed(left, right, Seq("k"), "ts", "ts", Seq("ts", "v"), w, "m_")
        .select("tag", "m_ts", "m_v")
        .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
      assert(got === want, s"bucketWidth=$w")
    }
  }

  test("asOfJoinBucketed: null keys never match (left preserved)") {
    val left = Seq((Option(1L), 100L, "l1"), (Option.empty[Long], 100L, "lnull"))
      .toDF("k", "ts", "tag")
    val right = Seq((Option(1L), 90L, "r1"), (Option.empty[Long], 90L, "rnull"))
      .toDF("k", "ts", "v")
    val got = TimeJoins
      .asOfJoinBucketed(left, right, Seq("k"), "ts", "ts", Seq("v"), 16L, "m_")
      .select("tag", "m_v")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toSet
    assert(got === Set(("l1", Some("r1")), ("lnull", None)))
  }

  test("asOfJoinBucketed == asOfJoin on real events (unique right timestamps)") {
    val purchases = events.filter($"event_type" === "purchase").select("user_id", "us")
    // dedupe (user, ts): among equal right timestamps the two forms may pick
    // different payload rows (window arrival order vs max_by) — match times
    // are identical either way, and unique timestamps make rows identical
    val clicks = events.filter($"event_type" === "click")
      .select("user_id", "us").distinct()
    val a = TimeJoins
      .asOfJoin(purchases, clicks, Seq("user_id"), "us", "us", Seq("us"), "c_")
    val b = TimeJoins
      .asOfJoinBucketed(purchases, clicks, Seq("user_id"), "us", "us", Seq("us"), 3600000000L, "c_")
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("rangeJoin matches naive inequality join, incl. bucket boundaries") {
    val gap = 10L
    val left = Seq((1L, 95L, "a"), (1L, 100L, "b"), (2L, 7L, "c")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 95L),  // equal ts: excluded (strictly after)
      (1L, 100L), // within 95+10, bucket boundary (100 DIV 10 = 10 vs 95 DIV 10 = 9)
      (1L, 105L), // exactly at 95+gap: included; also within 100+10
      (1L, 110L), // exactly at 100+gap: included for b, beyond 95+gap for a
      (2L, 18L),  // beyond 7+10
      (3L, 8L)    // wrong key
    ).toDF("k", "ts")

    val got = TimeJoins
      .rangeJoin(left, right, Seq("k"), "ts", "ts", gap, Seq("ts"), "r_")
      .select("tag", "r_ts")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    assert(got === Set(("a", 100L), ("a", 105L), ("b", 105L), ("b", 110L)))
  }

  test("rangeJoin matches naive inequality join on real events") {
    val gap = 300000000L
    val fast = TimeJoins
      .rangeJoin(events.select($"user_id", $"us"), events.select($"user_id", $"us"),
        Seq("user_id"), "us", "us", gap, Seq("us"), "b_")
    val naive = events.select($"user_id", $"us")
      .join(events.select($"user_id".as("bu"), $"us".as("b_us")),
        $"user_id" === $"bu" && $"b_us" > $"us" && $"b_us" <= $"us" + gap)
      .select($"user_id", $"us", $"b_us")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    assert(fast.count() === naive.count())
  }

  test("intervalJoin: half-open containment, m:n overlap, bucket boundaries") {
    val points = Seq(
      (1L, 10L, "p10"),  // in [5,15) and [10,20)
      (1L, 15L, "p15"),  // end-exclusive for [5,15); in [10,20)
      (1L, 5L, "p5"),    // start-inclusive for [5,15)
      (1L, 20L, "p20"),  // end-exclusive for [10,20) → no match
      (2L, 10L, "q10")   // wrong key
    ).toDF("k", "t", "tag")
    val ivs = Seq(
      (1L, 5L, 15L, "A"),
      (1L, 10L, 20L, "B"),
      (1L, 30L, 30L, "EMPTY") // zero-length: dropped
    ).toDF("k", "s", "e", "name")
    val got = TimeJoins
      .intervalJoin(points, ivs, Seq("k"), "t", "s", "e", Seq("name"), bucketWidth = 4L)
      .select("tag", "iv_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("p10", "A"), ("p10", "B"), ("p15", "B"), ("p5", "A")))
  }

  test("intervalJoin matches naive inequality join on real events") {
    val iv = events.filter(pmod($"us", lit(7)) === 0)
      .select($"user_id", $"us".as("s"), ($"us" + 600000000L).as("e"), $"event_type".as("p"))
    val pts = events.select($"user_id", $"us")
    val fast = TimeJoins
      .intervalJoin(pts, iv, Seq("user_id"), "us", "s", "e", Seq("p"), bucketWidth = 450000000L)
    val naive = pts.join(
        iv.select($"user_id".as("iu"), $"s", $"e", $"p".as("iv_p")),
        $"user_id" === $"iu" && $"us" >= $"s" && $"us" < $"e")
      .select($"user_id", $"us", $"iv_p")
    val fastSel = fast.select($"user_id", $"us", $"iv_p")
    assert(fastSel.exceptAll(naive).isEmpty && naive.exceptAll(fastSel).isEmpty)
    assert(fastSel.count() === naive.count())
  }

  test("intervalJoin hard-fails on intervals exceeding the bucket cap") {
    val points = Seq((1L, 10L)).toDF("k", "t")
    val ivs = Seq((1L, 0L, 100000L, "big")).toDF("k", "s", "e", "name")
    val ex = intercept[Exception] {
      TimeJoins.intervalJoin(points, ivs, Seq("k"), "t", "s", "e", Seq("name"),
        bucketWidth = 2L, maxIntervalBuckets = 16).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("exceeds 16 buckets")))
  }
}
