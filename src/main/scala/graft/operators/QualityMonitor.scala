package graft.operators

import graft.sources.AtomicWarehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

/** Data quality as a TIME SERIES — [[Expectations]] composed with the
  * transactional warehouse's CDC reads, the same cursor discipline as
  * [[IncrementalAgg]]: each [[refresh]] evaluates the rule list over ONLY
  * the rows appended since the last refresh (`appendsBetween` — file-set
  * difference, never a full rescan) and appends one report row per rule to
  * a persisted `quality/<table>/Report` ledger, tagged with the commit
  * window it measured. The report table answers the questions a one-shot
  * [[Expectations.check]] cannot: WHEN did nulls start arriving, WHICH
  * ingest batch carried the out-of-range rows, is quality drifting — per
  * commit, attributable, and itself time-travelable (it lives in the same
  * manifest log as the data it describes).
  *
  * Windows are delta-scoped, so windowed rules mean what they say:
  * not-null / range / pattern / set / FK violations in THIS window's rows.
  * A [[Expectations.Unique]] rule over a delta attests the BATCH is
  * internally duplicate-free (the cross-batch claim needs the full table —
  * run it through [[Expectations.check]] directly, or note that a unique
  * violation across batches surfaces in the batch that completes the
  * duplicate only via the full-scan path).
  *
  * A truncate inside the window (replace / compaction / restore) means
  * file-set difference ≠ row delta — the refresh then REBASES: it
  * re-checks the full table as-of the head (`readAt`) and marks the report
  * row `rebase = true`, exactly [[IncrementalAgg]]'s invalidation
  * discipline (silently skipping the window would hide whatever the
  * rewrite admitted). The cursor IS the report: the last measured-through
  * version is `max(to_version)` of the ledger itself, so a refresh that
  * finds no source rows in its window commits NOTHING — no bookkeeping
  * commit for the monitor to chase (a separate cursor table ratchets
  * forever: each cursor move is itself a commit, so the next refresh
  * always sees a newer head), refresh is idempotent at a quiet head, and
  * a crash mid-refresh re-runs the same window with the measurement and
  * its cursor advancing in the one report append.
  */
class QualityMonitor(wh: AtomicWarehouse, srcTable: String,
    srcSchema: StructType, rules: Seq[Expectations.Rule]) {
  require(rules.nonEmpty, "QualityMonitor needs at least one rule")

  val reportTable = s"quality/$srcTable/Report"

  val reportSchema: StructType = StructType(Seq(
    StructField("from_version", LongType, nullable = false),
    StructField("to_version", LongType, nullable = false),
    StructField("rebase", BooleanType, nullable = false),
    StructField("rule_id", LongType, nullable = false),
    StructField("rule", StringType, nullable = false),
    StructField("target", StringType, nullable = false),
    StructField("violations", LongType, nullable = false),
    StructField("total", LongType, nullable = false),
    StructField("pass", BooleanType, nullable = false)))

  def report(): DataFrame = wh.read(reportTable, reportSchema)

  /** The last measured-through version (0 = genesis, nothing measured) —
    * read off the report ledger itself (class doc).
    */
  def cursor(): Long = {
    val r = report().agg(max(col("to_version"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Measure (cursor, head] — a no-op (and no commit) when nothing new
    * committed or the window holds no source rows. Returns the number of
    * report rows appended.
    */
  def refresh(): Int = {
    val versions = wh.versions()
    if (versions.isEmpty) return 0
    val head = versions.last.toLong
    val from = cursor()
    if (head <= from) return 0
    val (slice, rebase) =
      try (wh.appendsBetween(srcTable, srcSchema, from.toInt, head.toInt), false)
      catch {
        // truncate in the window: file diff != row delta — rebase on the
        // full as-of-head state instead of under-reporting
        case _: IllegalStateException =>
          (wh.readAt(srcTable, srcSchema, head.toInt), true)
      }
    // a window in which only OTHER tables (or this monitor) committed is
    // not a measurement — commit nothing. A rebase to empty IS signal
    // (someone truncated the table) and stays reported.
    if (!rebase && slice.isEmpty) return 0
    val rep = Expectations.check(slice, rules)
      .select(lit(from).as("from_version"), lit(head).as("to_version"),
        lit(rebase).as("rebase"),
        col("rule_id"), col("rule"), col("target"),
        col("violations"), col("total"), col("pass"))
    wh.atomically(_.append(reportTable, rep))
    rules.size
  }
}
