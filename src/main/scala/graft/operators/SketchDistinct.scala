package graft.operators

import graft.sources.AtomicWarehouse
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** CDC-driven incremental DISTINCT-COUNT materialized view over HLL
  * sketches — the approximate twin of [[IncrementalAgg]] for the aggregate
  * that family can't carry: `count(DISTINCT x)` has unbounded per-group
  * state exactly, but a Datasketches HLL sketch is a few KB per group,
  * MERGEABLE (`hll_union`: sketch(S ∪ Δ) = union(sketch(S), sketch(Δ))),
  * and bounded-error. At 100 TB "unique users per slice" is only ever
  * computed this way: each refresh sketches JUST the appended window and
  * unions it into the state — the source scan disappears, the merge
  * shuffles group-count rows, never row-count.
  *
  * Retraction is where sketches differ fundamentally from signed partials:
  * an HLL CANNOT forget a value. When the refresh window holds row-level
  * deletes (change-feed `delete` / `update_preimage` rows), the view
  * recomputes ONLY the affected GROUPS from the source as-of the window
  * head — group keys are collected from the feed (delta-sized), the
  * re-scan filters to those groups (parquet row-group pruning via the
  * pushed per-column IN when the key set is small), and every untouched
  * group keeps its byte-identical sketch. Cost ∝ the affected groups'
  * data, never the corpus. A window the change feed refuses (replace /
  * pre-feed DML) rebuilds the whole view as-of head — same last resort,
  * same exactness contract as [[IncrementalAgg]].
  *
  * Estimates are deterministic for a given input set (Datasketches is a
  * deterministic algorithm), so the accumulated state is spec-pinnable;
  * they are NOT reproducible by other engines, so driver oracles validate
  * the estimate against the exact distinct in-query and output the exact.
  *
  * Single-writer per view, atomic (state, cursor) replace — the same
  * contract as every persisted index here.
  */
/** Approximate distinct-SET algebra over Theta sketches — the operation
  * family HLL can't do: |A ∩ B|, |A ∖ B|, |A ∪ B| of distinct keys across
  * two corpus slices without materializing either set. At 100 TB this is
  * the cross-corpus overlap question ("how many of slice A's users/URLs
  * also appear in slice B") answered in ONE pass: both sketches build in a
  * single aggregate over a tagged union — no join, no shuffle beyond the
  * one-row partial-merge — and the set algebra runs driver-side on two
  * KB-sized sketches. Estimates are validated against exact counts in the
  * driver query; [[graft.SketchSpec]] pins the union-build ≡ per-side
  * build and the set-op error bounds.
  */
object SketchSetOps {
  import org.apache.spark.sql.functions._

  /** One-row frame (est_a, est_b, est_intersection, est_union, est_diff_a)
    * for the distinct sets of `a[keyA]` and `b[keyB]`. Null keys are not
    * set members (aggregates skip nulls — also what makes the tagged-union
    * trick sound: the other side's rows contribute null to each sketch).
    */
  def overlap(a: DataFrame, keyA: String, b: DataFrame, keyB: String,
      lgK: Int = 12): DataFrame = {
    val u = a.select(col(keyA).as("k"), lit(0).as("side"))
      .unionByName(b.select(col(keyB).as("k"), lit(1).as("side")))
    u.agg(
        theta_sketch_agg(when(col("side") === 0, col("k")), lgK).as("ska"),
        theta_sketch_agg(when(col("side") === 1, col("k")), lgK).as("skb"))
      .select(
        theta_sketch_estimate(col("ska")).as("est_a"),
        theta_sketch_estimate(col("skb")).as("est_b"),
        theta_sketch_estimate(theta_intersection(col("ska"), col("skb")))
          .as("est_intersection"),
        theta_sketch_estimate(theta_union(col("ska"), col("skb")))
          .as("est_union"),
        theta_sketch_estimate(theta_difference(col("ska"), col("skb")))
          .as("est_diff_a"))
  }
}

abstract class SketchMv(wh: AtomicWarehouse, name: String,
    srcTable: String, srcSchema: StructType, groupCols: Seq[String]) {

  /** The sketched column (rows with a null value are not observations). */
  protected def valueCol: String
  /** The per-group sketch-building aggregate expression. */
  protected def sketchAggExpr: Column
  /** Union/merge of two non-null sketches of this kind. */
  protected def unionSk(a: Column, b: Column): Column

  require(groupCols.nonEmpty, "sketch MV requires at least one group column")
  require(srcSchema.fieldNames.contains(valueCol),
    s"sketched column '$valueCol' is not in the source schema")

  val stateTable = s"mv/$name/SketchState"
  val cursorTable = s"mv/$name/SketchCursor"

  val cursorSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false)))

  protected def sketchOf(df: DataFrame): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(sketchAggExpr.as("sk"))

  val stateSchema: StructType = sketchOf(wh.spark.createDataFrame(
    wh.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], srcSchema)).schema

  /** The per-group sketches as of [[cursor]]; empty before first refresh. */
  def state(): DataFrame =
    if (wh.exists(stateTable)) wh.read(stateTable, stateSchema)
    else wh.spark.createDataFrame(
      wh.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)

  def cursor(): Int =
    if (!wh.exists(cursorTable)) 0
    else wh.read(cursorTable, cursorSchema).agg(max(col("version"))).head() match {
      case r if r.isNullAt(0) => 0
      case r => r.getLong(0).toInt
    }

  /** Union the per-group sketches; group keys join null-safe, an absent
    * side passes the present sketch through (a raw union would fail on null).
    */
  private def merge(a: DataFrame, b: DataFrame): DataFrame = {
    val aa = a.alias("a")
    val bb = b.alias("b")
    val cond = groupCols.map(k => col(s"a.$k") <=> col(s"b.$k")).reduce(_ && _)
    aa.join(bb, cond, "full_outer").select(
      groupCols.map(k => coalesce(col(s"a.$k"), col(s"b.$k")).as(k)) :+
        when(col("a.sk").isNull, col("b.sk"))
          .when(col("b.sk").isNull, col("a.sk"))
          .otherwise(unionSk(col("a.sk"), col("b.sk"))).as("sk"): _*)
  }

  /** How many affected group-key tuples the recompute collects to the
    * driver before giving up on pruning and rebuilding the whole view —
    * retraction touching more groups than this is corpus-scale churn.
    */
  private val recomputeKeyCap = 10000

  private def keyFrame(keys: Seq[org.apache.spark.sql.Row]): DataFrame =
    wh.spark.createDataFrame(java.util.Arrays.asList(keys: _*),
      StructType(groupCols.map(c => srcSchema(c))))

  /** Null-safe group-key equality between aliases `l` and `r` — a NULL
    * group key is a real group here (`groupBy` keeps it), so every key
    * join in the retraction path must use `<=>`: plain equality silently
    * drops the null-keyed group from both the semi (recompute) and anti
    * (other-inserts) sides while the untouched-state anti-join removes
    * its sketch, losing the group's base.
    */
  private def keyEq(l: String, r: String): Column =
    groupCols.map(k => col(s"$l.$k") <=> col(s"$r.$k")).reduce(_ && _)

  /** Recompute the sketches of exactly `keys`' groups from the source
    * as-of `head`, keep every other group's state untouched.
    */
  private def recomputeGroups(keys: Seq[org.apache.spark.sql.Row],
      head: Int): DataFrame = {
    val base = wh.readAt(srcTable, srcSchema, head)
    // per-column IN pushes to the parquet scan (row-group pruning);
    // the semi-join restores tuple exactness for composite keys
    val perCol = groupCols.zipWithIndex.map { case (c, i) =>
      val vals = keys.map(_.get(i)).distinct
      if (vals.contains(null)) col(c).isNull || col(c).isin(vals.filter(_ != null): _*)
      else col(c).isin(vals: _*)
    }.reduce(_ && _)
    val keyDf = keyFrame(keys)
    val touched = base.filter(perCol).alias("s")
      .join(keyDf.alias("k"), keyEq("s", "k"), "left_semi")
    val untouched = state().alias("s")
      .join(keyDf.alias("k"), keyEq("s", "k"), "left_anti")
      .select(groupCols.map(k => col(s"s.$k").as(k)) :+ col("s.sk"): _*)
    untouched.unionByName(sketchOf(touched))
  }

  /** Fold the source commits since the last refresh into the sketches and
    * advance the cursor to the head; append-only windows union delta
    * sketches, retraction windows recompute affected groups (class doc).
    * Publishes nothing when the window holds no source change.
    */
  def refresh(): Int = {
    val head = wh.versions().lastOption.getOrElse(0)
    val cur = cursor()
    if (head <= cur) return cur
    val deltaOpt =
      try Some(wh.appendsBetween(srcTable, srcSchema, cur, head))
      catch { case _: IllegalStateException => None }
    if (deltaOpt.exists(_.isEmpty)) return cur
    val feedOpt = if (deltaOpt.isDefined) None else
      try Some(wh.changesBetween(srcTable, srcSchema, cur, head))
      catch { case _: IllegalStateException => None }
    if (deltaOpt.isEmpty && feedOpt.exists(_.isEmpty)) return cur
    val newState = (deltaOpt, feedOpt) match {
      case (Some(delta), _) => merge(state(), sketchOf(delta))
      case (None, Some(feed)) =>
        // inserts union in cheap; any retracted row forces its GROUP to
        // recompute (sketches can't forget) — collect the affected keys,
        // capped: past the cap this is corpus-scale churn, rebuild
        val retracted = feed
          .filter(col("_change_type").isin("delete", "update_preimage"))
          .select(groupCols.map(col): _*).distinct()
        val keys = retracted.limit(recomputeKeyCap + 1).collect().toSeq
        if (keys.isEmpty)
          merge(state(), sketchOf(
            feed.filter(col("_change_type").isin("insert", "update_postimage"))))
        else if (keys.size <= recomputeKeyCap) {
          // recompute as-of head covers the window's inserts to those
          // groups too; inserts to OTHER groups union in from the feed
          val otherInserts = feed
            .filter(col("_change_type").isin("insert", "update_postimage"))
            .alias("s")
            .join(keyFrame(keys).alias("k"), keyEq("s", "k"), "left_anti")
          merge(recomputeGroups(keys, head), sketchOf(otherInserts))
        } else sketchOf(wh.readAt(srcTable, srcSchema, head))
      case _ => sketchOf(wh.readAt(srcTable, srcSchema, head))
    }
    wh.atomically { w =>
      w.replace(stateTable, newState)
      w.replace(cursorTable, wh.spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(head.toLong)), cursorSchema))
    }
    head
  }
}

/** The HLL (distinct-count) instance of [[SketchMv]] — class doc above. */
class SketchDistinct(wh: AtomicWarehouse, name: String,
    srcTable: String, srcSchema: StructType,
    groupCols: Seq[String], distinctCol: String, lgK: Int = 12)
    extends SketchMv(wh, name, srcTable, srcSchema, groupCols) {

  protected def valueCol: String = distinctCol
  protected def sketchAggExpr: Column = hll_sketch_agg(col(distinctCol), lgK)
  protected def unionSk(a: Column, b: Column): Column = hll_union(a, b)

  /** Per-group distinct estimates: (groupCols..., distinct_est: Long). */
  def estimate(): DataFrame =
    state().select(groupCols.map(col) :+
      hll_sketch_estimate(col("sk")).as("distinct_est"): _*)
}

/** The KLL (quantile) instance of [[SketchMv]]: per-group mergeable
  * quantile sketches over a numeric column — the 100 TB percentile path
  * ([[Percentiles]] is exact but re-sorts the world; `q18`'s built-in
  * `percentile` buffers per group). A KLL sketch is KBs per group with a
  * RANK-error guarantee (~1.65% at the default k=200): refresh cost and
  * retraction semantics are [[SketchMv]]'s — append windows merge delta
  * sketches, retractions recompute only the affected groups. Values cast
  * to double (the only lossless-enough common carrier for the price/qty
  * columns this serves).
  */
class SketchQuantile(wh: AtomicWarehouse, name: String,
    srcTable: String, srcSchema: StructType,
    groupCols: Seq[String], quantCol: String, k: Int = 200)
    extends SketchMv(wh, name, srcTable, srcSchema, groupCols) {

  protected def valueCol: String = quantCol
  protected def sketchAggExpr: Column =
    kll_sketch_agg_double(col(quantCol).cast("double"), k)
  protected def unionSk(a: Column, b: Column): Column =
    kll_sketch_merge_double(a, b)

  /** Per-group quantile estimates at ranks `ps` (each 0..1):
    * (groupCols..., p<pct>: Double...).
    */
  def quantiles(ps: Seq[Double]): DataFrame =
    state().select(groupCols.map(col) ++ ps.map(p =>
      kll_sketch_get_quantile_double(col("sk"), lit(p))
        .as(s"p${math.round(p * 100)}")): _*)

  /** Per-group observation counts riding the sketches (exact). */
  def counts(): DataFrame =
    state().select(groupCols.map(col) :+
      kll_sketch_get_n_double(col("sk")).as("n"): _*)
}
