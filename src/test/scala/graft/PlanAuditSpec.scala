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
}
