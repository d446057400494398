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
}
