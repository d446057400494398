package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Row-level data-quality expectations — the dataset-level extension of the
  * reference's header-set validation (P8: `core/transformations.py`
  * validates COLUMN presence before a load; a production load also asserts
  * what's IN the columns — the dbt-tests / Great-Expectations shape:
  * not-null, unique key, referential integrity, range, pattern,
  * set-membership). Output is a violations REPORT, one row per rule:
  * `(rule, target, violations, total, pass)` — the gate a pipeline consults
  * before publishing a batch, and a metric a warehouse tracks over time.
  *
  * 100 TB shape — the rule list compiles into at most THREE scans,
  * regardless of rule count:
  *   - every row-local rule (not-null / range / pattern / set) becomes one
  *     `sum(when(violated, 1))` column of a SINGLE aggregate pass — one
  *     corpus scan for the whole family, map-side combined;
  *   - each unique-key rule is one groupBy on its key (violations =
  *     `Σ (group_size − 1)` over duplicate groups = `total − distinct`,
  *     computed as two columns of one aggregate — no self-join);
  *   - each referential rule is one broadcast left-anti probe of the
  *     (dimension-sized) reference key set — the corpus side never
  *     shuffles.
  *
  * Determinism: every number is an exact long count, so the `etl_
  * expectations` oracle replays each rule as a SQL count and the report
  * matches digit for digit. Null semantics are stated per rule: range /
  * pattern / set rules do NOT count nulls as violations (null presence is
  * [[NotNull]]'s job — compose both when you mean both), and a null FK is
  * likewise [[NotNull]]'s concern, matching SQL foreign keys.
  */
object Expectations {

  sealed trait Rule { def name: String; def target: String }
  /** Column must be non-null. */
  final case class NotNull(col: String) extends Rule {
    def name = "not_null"; def target = col
  }
  /** `lo ≤ col ≤ hi` (inclusive); nulls are not violations. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = "in_range"; def target = col
  }
  /** Column matches the (anchored) regex; nulls are not violations. */
  final case class Matches(col: String, regex: String) extends Rule {
    def name = "matches"; def target = col
  }
  /** Column value in the literal set; nulls are not violations. */
  final case class InSet(col: String, values: Seq[String]) extends Rule {
    def name = "in_set"; def target = col
  }
  /** The column tuple is a unique key (null-safe grouping — two all-null
    * keys DO collide, like `GROUP BY`).
    */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = "unique"; def target = cols.mkString(",")
  }
  /** Every non-null value of `col` exists in `ref.refCol` (foreign key);
    * `ref` must be broadcast-sized (a dimension).
    */
  final case class RefIn(col: String, ref: DataFrame, refCol: String) extends Rule {
    def name = "ref_in"; def target = col
  }

  private def rowLocalViolation(r: Rule): Option[Column] = r match {
    case NotNull(c) => Some(col(c).isNull)
    case InRange(c, lo, hi) =>
      Some(col(c).isNotNull && (col(c) < lo || col(c) > hi))
    case Matches(c, re) => Some(col(c).isNotNull && !col(c).rlike(re))
    case InSet(c, vs) =>
      Some(col(c).isNotNull && !col(c).isin(vs.map(v => v: Any): _*))
    case _ => None
  }

  /** Evaluate `rules` against `df`; returns the report (see class doc),
    * one row per rule in DECLARATION order (`rule_id` carries it — reports
    * are things people diff).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "check needs at least one rule")
    val spark = df.sparkSession
    val rowLocal = rules.zipWithIndex
      .flatMap { case (r, i) => rowLocalViolation(r).map(v => (r, i, v)) }
    // one aggregate scan for every row-local rule + the shared total
    val localCounts: Map[Int, (Long, Long)] =
      if (rowLocal.isEmpty) Map.empty
      else {
        val aggs = count(lit(1)).as("__total") +:
          rowLocal.map { case (_, i, v) =>
            sum(when(v, 1L).otherwise(0L)).as(s"__v$i")
          }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        val total = row.getLong(0)
        rowLocal.zipWithIndex.map { case ((_, i, _), j) =>
          i -> (row.getLong(j + 1), total)
        }.toMap
      }
    lazy val totalCount: Long =
      localCounts.values.headOption.map(_._2).getOrElse(df.count())
    val results: Seq[(Int, Rule, Long, Long)] = rules.zipWithIndex.map {
      case (r: Unique, i) =>
        // a struct over the key columns is itself never null (its FIELDS
        // may be), so count_distinct sees every tuple — all-null keys
        // collide into one group exactly like GROUP BY, spec-pinned
        val row = df.agg(count(lit(1)).as("t"),
          count_distinct(struct(r.cols.map(col): _*)).as("d")).head()
        (i, r, row.getLong(0) - row.getLong(1), row.getLong(0))
      case (r: RefIn, i) =>
        val refKeys = r.ref.select(col(r.refCol).as("__k")).distinct()
        val bad = df.filter(col(r.col).isNotNull)
          .join(broadcast(refKeys), col(r.col) === col("__k"), "left_anti")
          .count()
        (i, r, bad, totalCount)
      case (r, i) =>
        val (v, t) = localCounts(i)
        (i, r, v, t)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(results.map { case (i, r, v, t) =>
        org.apache.spark.sql.Row(i.toLong, r.name, r.target, v, t, v == 0L)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rule_id", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rule", org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("target", org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("violations", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("total", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("pass", org.apache.spark.sql.types.BooleanType, nullable = false))))
  }

  /** [[check]] that THROWS when any rule fails — the pre-publish gate form
    * (the reference's validation path rejects a bad upload the same way).
    */
  def enforce(df: DataFrame, rules: Seq[Rule]): Unit = {
    val bad = check(df, rules).filter(!col("pass"))
      .select(col("rule"), col("target"), col("violations")).collect()
    require(bad.isEmpty, "expectations failed: " + bad.map(r =>
      s"${r.getString(0)}(${r.getString(1)})=${r.getLong(2)}").mkString(", "))
  }
}
