package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering for
  * warehouse tables, the `OPTIMIZE ... ZORDER BY (a, b)` capability of the
  * public lakehouse formats (Delta/Iceberg), rebuilt on plain parquet +
  * row-group statistics.
  *
  * Why it matters at 100 TB: a table can be SORTED by only one key. Sorting
  * events by `ts` makes time predicates prune row groups via min/max stats,
  * but a `user_id` predicate still reads every row group in the time range.
  * Interleaving the bits of both keys into one Morton code and sorting by
  * THAT gives every row group a tight bounding box in (user, time) space —
  * both single- and two-dimensional predicates prune, at the cost of each
  * dimension pruning somewhat less tightly than its dedicated sort
  * (measured: `tools/ZOrderProbe`, BASELINE.md).
  *
  * The kernel is deliberately built from integer-exact built-ins only
  * (subtract / arithmetic shift / mask / or — no floats anywhere), so it
  * stays inside whole-stage codegen AND the DuckDB oracle can restate it
  * bit-for-bit ([[zvalueSql]] emits the same formula in SQL; the
  * `q21_zvalue` gate holds both sides equal).
  *
  * Bucketing contract: each input is reduced to `bits` buckets as
  * `(x - min) >> shift`. `min` must be ≤ the column minimum (non-negative
  * shift input), and `shift` chosen so the bucketed range fits `bits` bits
  * — buckets beyond that silently truncate (both sides identically), which
  * degrades locality, never correctness. Power-of-two bucket widths keep
  * the whole pipeline in integer shifts; callers pass explicit
  * `min`/`shift` constants so the layout (and the oracle) is deterministic
  * rather than data-dependent.
  */
object Layout {

  /** Interleaved 2-D Morton code: bit k of each bucketed input lands at
    * output bits 2k (for `a`) and 2k+1 (for `b`). ≤ 31 bits per dimension
    * fits the 62-bit positive range of a long.
    */
  def zvalue(a: Column, aMin: Long, aShift: Int,
      b: Column, bMin: Long, bShift: Int, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val ab = shiftright(a - lit(aMin), aShift)
    val bb = shiftright(b - lit(bMin), bShift)
    (0 until bits).map { k =>
      shiftleft(shiftright(ab, k).bitwiseAND(lit(1L)), 2 * k)
        .bitwiseOR(shiftleft(shiftright(bb, k).bitwiseAND(lit(1L)), 2 * k + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The identical formula as engine-neutral SQL (valid in both Spark SQL
    * and DuckDB — bitwise ops and arithmetic shifts only), for oracle
    * restatement. `a`/`b` are SQL expressions yielding BIGINT.
    */
  def zvalueSql(a: String, aMin: Long, aShift: Int,
      b: String, bMin: Long, bShift: Int, bits: Int = 16): String = {
    val ab = s"((($a) - $aMin) >> $aShift)"
    val bb = s"((($b) - $bMin) >> $bShift)"
    (0 until bits).map { k =>
      s"((($ab >> $k) & 1) << ${2 * k}) | ((($bb >> $k) & 1) << ${2 * k + 1})"
    }.mkString("(", " | ", ")")
  }

  /** Re-lay a frame along the Morton curve: range-partition by z so files
    * own contiguous curve segments, sort within so row groups do too —
    * min/max stats then bound every row group in BOTH dimensions. The z
    * column is dropped after layout (it is derivable, not data).
    */
  def zorder(df: DataFrame, z: Column, numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be positive, got $numFiles")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** [[zorder]] with DATA-DERIVED curve constants, for maintenance passes
    * that don't know the table's ranges: one small aggregate reads each
    * column's min/max, then each dimension gets the smallest shift that fits
    * its observed range into `bits` buckets. Unlike [[zvalue]]'s explicit
    * constants the curve depends on the data — fine for a compaction-time
    * re-layout, where the curve affects only pruning tightness, never
    * results. Integer (long-castable) columns only; an empty table (or
    * all-null key) returns the frame unchanged.
    */
  def zorderAuto(df: DataFrame, colA: String, colB: String,
      bits: Int = 16, numFiles: Int = 1): DataFrame = {
    val r = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    if (r.isNullAt(0) || r.isNullAt(2)) return df
    val (aLo, aHi, bLo, bHi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    def needed(lo: Long, hi: Long): Int =
      math.max(64 - java.lang.Long.numberOfLeadingZeros(hi - lo), 1)
    // BALANCED widths (tools/ZOrderProbe, measured): interleaving a wide
    // dimension against a narrow one leaves the curve's high bits all one
    // dimension — a degenerate single-key sort that stops the other
    // dimension pruning. Both dimensions get the SAME effective width: the
    // narrower one's significant bits (capped by `bits`), with the wider
    // one shifted down to match.
    val effBits = math.min(bits, math.min(needed(aLo, aHi), needed(bLo, bHi)))
    def shiftFor(lo: Long, hi: Long): Int = math.max(needed(lo, hi) - effBits, 0)
    zorder(df,
      zvalue(col(colA).cast("long"), aLo, shiftFor(aLo, aHi),
        col(colB).cast("long"), bLo, shiftFor(bLo, bHi), effBits),
      numFiles)
  }
}
