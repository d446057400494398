package graft

/** Pins the bench's canary-gated median and the testdata fingerprint — the
  * two r10 additions that make BENCHBOOK lines adjudicable without re-running
  * anything (which reps were measured on a quiet machine, and which data they
  * were measured against).
  */
class BenchSpec extends SparkSpec {

  test("cleanMedian ignores contaminated reps (r9 doc_stats profile)") {
    // The motivating shape: five reps, canaries flat/flat/flat/2.5×/2.2× —
    // the raw median (1.919) straddles the contamination boundary; the clean
    // median must be computed over the three flat-canary reps only. The gate
    // is canary-only by design: a slow rep whose canary was flat is a real
    // measurement, not noise to discard.
    val times = Seq(0.595, 0.618, 1.919, 3.766, 4.308)
    val canaries = Seq(0.060, 0.062, 0.058, 0.150, 0.132)
    val mc = Bench.cleanMedian(times, canaries, 0.062).get
    assert(mc == 0.618, s"expected median of the flat-canary reps (0.618), got $mc")
  }

  test("cleanMedian gates on the canary, and two flat reps beat three inflated ones") {
    // contamination visible IN the canaries: only reps 0,1 are clean
    val times = Seq(0.595, 0.618, 1.919, 3.766, 4.308)
    val canaries = Seq(0.060, 0.062, 0.155, 0.150, 0.132)
    val mc = Bench.cleanMedian(times, canaries, 0.062).get
    assert(mc == (0.595 + 0.618) / 2, s"expected mean-of-two flat reps, got $mc")
  }

  test("cleanMedian falls back to min with fewer than 2 clean reps") {
    val times = Seq(2.4, 1.9, 3.1)
    val canaries = Seq(0.30, 0.25, 0.28) // everything inflated vs base 0.06
    assert(Bench.cleanMedian(times, canaries, 0.06).contains(1.9))
  }

  test("cleanMedian never exceeds the raw median (r17 dedup_components_incremental shape)") {
    // most reps carry inflated canaries; the two canary-clean reps happen to
    // be the SLOW ones (the machine quieted down exactly while the query ran
    // slow for unrelated reasons). The gate would report 14.8 as "clean"
    // against a raw median of 4.2 — the guard caps clean at the raw median.
    val times = Seq(4.0, 4.1, 4.2, 14.7, 14.9)
    val canaries = Seq(0.20, 0.20, 0.20, 0.060, 0.062)
    assert(Bench.cleanMedian(times, canaries, 0.062).contains(4.2))
  }

  test("cleanMedian with no baseline gates nothing; empty reps yield None") {
    val times = Seq(1.0, 2.0, 3.0)
    assert(Bench.cleanMedian(times, Seq(9.0, 9.0, 9.0), 0.0).contains(2.0))
    assert(Bench.cleanMedian(Nil, Nil, 0.05).isEmpty)
  }

  test("dataFingerprint records bytes+rows per table from the sf dir") {
    val fp = Bench.dataFingerprint(spark, "/root/testdata/sf0.001")
    val entry = """"([a-z0-9_]+)":\{"bytes":(\d+),"rows":(-?\d+)\}""".r
    val tables = entry.findAllMatchIn(fp)
      .map(m => (m.group(1), m.group(2).toLong, m.group(3).toLong)).toVector
    val names = tables.map(_._1).toSet
    assert(Set("lineitem", "orders", "documents", "embeddings").subsetOf(names),
      s"fingerprint missing expected tables: $names")
    tables.foreach { case (n, bytes, rows) =>
      assert(bytes > 0, s"$n: zero bytes"); assert(rows >= 0, s"$n: footer count failed")
    }
    // row counts are real footer counts, not placeholders
    val li = tables.find(_._1 == "lineitem").get
    assert(li._3 == spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count())
    // nonexistent dir degrades to an empty (but valid) object
    assert(Bench.dataFingerprint(spark, "/no/such/dir") == "{}")
  }
}
