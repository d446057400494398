package graft

import graft.operators.Percentiles
import org.apache.spark.sql.functions._

/** The sort+window exact-percentile rewrite must agree with Spark's built-in
  * exact `percentile` aggregate bit-for-bit (same (n-1)·q interpolation).
  */
class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  test("window rewrite equals the built-in exact percentile aggregate") {
    // deterministic mixed data: uneven groups, duplicates, negative values
    val df = spark.range(0, 10007)
      .select((col("id") % 3).cast("string").as("g"),
        (pmod(col("id") * 2654435761L, lit(10007)) - 5000).cast("double").as("v"))
    val qs = Seq("p10" -> 0.1, "p25" -> 0.25, "p50" -> 0.5, "p77" -> 0.77, "p100" -> 1.0)
    val rewrite = Percentiles.exactGroupPercentiles(df, Seq("g"), "v", qs)
      .orderBy("g").collect().map(r => (0 to 5).map(r.get).toSeq)
    val builtin = df.groupBy("g")
      .agg(percentile($"v", lit(0.1)).as("p10"), percentile($"v", lit(0.25)).as("p25"),
        percentile($"v", lit(0.5)).as("p50"), percentile($"v", lit(0.77)).as("p77"),
        percentile($"v", lit(1.0)).as("p100"))
      .orderBy("g").collect().map(r => (0 to 5).map(r.get).toSeq)
    assert(rewrite.toSeq == builtin.toSeq)
  }

  test("single-element and two-element groups interpolate correctly") {
    val df = Seq(("a", 10.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val out = Percentiles.exactGroupPercentiles(df, Seq("g"), "v",
      Seq("p50" -> 0.5, "p0" -> 0.0, "p100" -> 1.0))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", 10.0, 10.0, 10.0), ("b", 1.5, 1.0, 2.0)))
  }
}
