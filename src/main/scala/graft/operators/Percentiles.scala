package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact group percentiles as a sort + window rewrite — the shape that
  * scales where the built-in exact `percentile` aggregate does not.
  *
  * The built-in builds a per-group counts map inside ObjectHashAggregate:
  * per-partition maps as large as the group's distinct values, merged
  * single-threaded per group at the end — at sf0.1 that merge alone makes
  * the aggregate ~5 s, and at 100 TB the maps don't fit anywhere. Here the
  * heavy lifting is ONE hash-partitioned sort (Tungsten spill-able, linear),
  * a running `row_number`, and a partial-aggregating `max(when(rn = target))`
  * that plucks the two interpolation rows per (group, percentile) — the
  * group's data never concentrates into one structure.
  *
  * Interpolation matches `Percentile`/DuckDB `quantile_cont` exactly:
  * pos = (n-1)·q, result = v_lo·(⌈pos⌉−pos) + v_hi·(pos−⌊pos⌋) — the
  * `q18_percentiles` oracle is bit-exact against quantile_cont, and
  * PercentilesSpec pins bit-equality against the built-in aggregate.
  */
object Percentiles {

  /** One row per group with a column per requested percentile.
    *
    * Contract difference vs the built-in aggregate: groups whose values are
    * ALL null are OMITTED from the output (nulls are filtered before the
    * sort), where the built-in emits the group with null percentiles. Groups
    * with at least one non-null value agree bit-for-bit.
    *
    * @param qs (outputName, percentile in [0,1]) pairs
    */
  def exactGroupPercentiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[(String, Double)],
      extraAggs: Seq[Column] = Nil): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0 && q <= 1 },
      "percentiles must lie in [0,1]")
    val gcols = groupCols.map(col)
    val ranked = df
      .select(gcols :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(gcols: _*).orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(gcols: _*)))
    val pluck = qs.flatMap { case (name, qv) =>
      val pos = (col("__n") - 1) * lit(qv)
      val loIdx = floor(pos) + 1 // row_number is 1-based
      Seq(
        max(when(col("__rn") === loIdx, col("__v"))).as(s"__lo_$name"),
        max(when(col("__rn") === loIdx + 1, col("__v"))).as(s"__hi_$name"),
        max(when(col("__rn") === loIdx, pos)).as(s"__p_$name"))
    } ++ extraAggs
    // the groupBy keys equal the window partitioning, so no second exchange
    val agged = ranked.groupBy(gcols: _*).agg(pluck.head, pluck.tail: _*)
    val extraNames = agged.columns.filterNot(c =>
      c.startsWith("__") || groupCols.contains(c))
    agged.select(gcols ++ qs.map { case (name, _) =>
      // the built-in's exact arithmetic, term for term:
      // lo·(⌈pos⌉−pos) + hi·(pos−⌊pos⌋), short-circuiting integral pos —
      // the algebraically-equal lo+(hi−lo)·frac form differs in the last ulp
      val p = col(s"__p_$name")
      val lo = col(s"__lo_$name")
      val hi = coalesce(col(s"__hi_$name"), col(s"__lo_$name"))
      when(ceil(p) === floor(p), lo)
        .otherwise(lo * (ceil(p) - p) + hi * (p - floor(p))).as(name)
    } ++ extraNames.map(col): _*)
  }
}
