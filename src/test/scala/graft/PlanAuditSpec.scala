package graft

import graft.tools.PlanAudit

/** CI gate for plan shape: building every driver query's physical plan at
  * sf0.001 must produce zero unlabeled cartesian/BroadcastNestedLoopJoin
  * operators (the FoldablePropagation incident — literal fixture rows
  * folding join keys into constants and silently degrading broadcast
  * anti/outer joins to BNLJ — is exactly the regression this catches).
  *
  * Plan CONSTRUCTION only, but side-effecting queries (ledger lifecycle,
  * stream drains) do their work at construction time, so this spec also
  * smoke-runs those paths end to end.
  */
class PlanAuditSpec extends SparkSpec {
  test("no unlabeled cartesian or nested-loop joins in any driver query plan") {
    val a = PlanAudit.sweep(spark, "/root/testdata/sf0.001")
    assert(a.errors.isEmpty, s"plans failed to build:\n${a.errors.mkString("\n")}\n${a.report}")
    assert(a.flagged.isEmpty, s"unlabeled cartesian/BNLJ:\n${a.flagged.mkString("\n")}\n${a.report}")
  }

  test("merge chain plans sanely with every broadcast hint disabled") {
    // the dimension-outgrew-memory scenario: Merge's conditional hints off
    // (spark.graft.merge.broadcastMaxBytes=-1) AND AQE's auto-broadcast off
    // (autoBroadcastJoinThreshold=-1). The chain must still build shuffled
    // hash/sort-merge joins — never BNLJ/cartesian — and produce the same
    // rows as the hinted plan.
    val mergeQs = Set("etl_merge_providers", "etl_merge_endstate")
    val want = mergeQs.map(q => q ->
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").collect().toSet).toMap
    spark.conf.set("spark.graft.merge.broadcastMaxBytes", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = PlanAudit.sweep(spark, "/root/testdata/sf0.001", Some(mergeQs))
      assert(a.errors.isEmpty, s"unhinted merge plans failed:\n${a.errors.mkString("\n")}")
      assert(a.flagged.isEmpty,
        s"unhinted merge chain degraded to cartesian/BNLJ:\n${a.flagged.mkString("\n")}\n${a.report}")
      mergeQs.foreach { q =>
        val got = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").collect().toSet
        assert(got == want(q), s"$q rows changed without broadcast hints")
      }
    } finally {
      spark.conf.unset("spark.graft.merge.broadcastMaxBytes")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
