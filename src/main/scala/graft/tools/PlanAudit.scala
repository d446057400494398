package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Anti-pattern sweep over EVERY driver query's physical plan: counts the
  * operators that decide 100 TB behavior (shuffles, broadcasts, sorts) and
  * flags the ones that should never appear outside a labeled kernel
  * (cartesian products, broadcast nested-loop joins). PlanAuditSpec runs the
  * sweep in `sbt test`, so a plan-shape regression (the FoldablePropagation
  * trap: literal seed rows folding join keys → silent BNLJ) fails CI instead
  * of surfacing as a 100 TB incident.
  */
object PlanAudit {
  // Audited exceptions — every nested-loop below has a BOUNDED broadcast
  // side by construction:
  //   - dedup_jaccard/dedup_embedding: all-pairs verification kernels,
  //     quadratic BY DESIGN, bucketed scale path implemented beside them;
  //   - sim_topk/sim_ivf*: deliberate crossJoin(broadcast(querySet)) /
  //     broadcast(centroids) — the corpus side streams, never shuffles
  //     (sim_ivf_pq rides the same assignCellsProbes centroid broadcast;
  //     its ADC scoring itself is equi-joined);
  //   - doc_hybrid_rrf: its semantic leg IS the sim_topk kernel (broadcast
  //     query-set brute force); the lexical leg and the fusion are
  //     equi-joined and bounded;
  //   - dedup_semantic: the same broadcast(centroids) assign kernel (×3
  //     subplan references inline; the scale path feeds a persisted
  //     assignment table through semanticDedupAssigned instead);
  // The merge queries are deliberately NOT here: their joins must plan as
  // hash joins (their fixtures seed lookups as LocalRelation DATA rows —
  // literal-column seeds would FoldablePropagation-fold the join keys
  // away and degrade to BNLJ, as would a broadcast hint on the product
  // upsert's full outer).
  val kernelAllowlist: Set[String] = Set("dedup_jaccard", "dedup_embedding",
    "sim_topk", "sim_topk_sq8", "sim_ivf", "sim_ivf_trained",
    "sim_ivf_persisted", "sim_ivf_sq8", "sim_ivf_stream", "sim_ivf_pq",
    "sim_ivf_pq_residual", "sim_rerank", "dedup_semantic", "doc_hybrid_rrf",
    "doc_hybrid_rrf_weighted",
    // same labeled kernel as sim_ivf_persisted: the IVF query-to-centroid
    // assignment is a broadcast-centroid crossJoin by design (tiny side)
    "multimodal_ann")

  final case class Audit(report: String, flagged: List[String], errors: List[String])

  /** Sweep all (or `only`) queries' executed plans; flagged = unlabeled
    * cartesian/BNLJ, errors = queries whose plan could not be built.
    */
  def sweep(spark: SparkSession, sfDir: String,
      only: Option[Set[String]] = None): Audit = {
    var flagged = List.empty[String]
    var errors = List.empty[String]
    val sb = new StringBuilder
    sb ++= f"${"query"}%-28s shuf bcast sort cart bnlj\n"
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          def c(s: String) = plan.sliding(s.length).count(_ == s)
          val cart = c("CartesianProduct")
          val bnlj = c("BroadcastNestedLoopJoin")
          sb ++= f"$name%-28s ${c("Exchange hashpartitioning")}%4d ${c("BroadcastExchange")}%5d " +
            f"${c("Sort ")}%4d $cart%4d $bnlj%4d\n"
          if ((cart > 0 || bnlj > 0) && !kernelAllowlist.contains(name))
            flagged ::= s"$name: cartesian=$cart bnlj=$bnlj"
        } catch {
          case e: Exception =>
            sb ++= f"$name%-28s ERROR ${e.getMessage.take(80)}\n"
            errors ::= s"$name: ${e.getMessage.take(200)}"
        }
      }
    Audit(sb.result(), flagged, errors)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.get("local[8]")
    val a = sweep(spark, sfDir)
    print(a.report)
    println(if (a.flagged.isEmpty && a.errors.isEmpty)
      "\nAUDIT CLEAN: no unlabeled cartesian/nested-loop joins"
    else s"\nAUDIT FLAGS:\n${(a.flagged ++ a.errors).mkString("\n")}")
    spark.stop()
  }
}
