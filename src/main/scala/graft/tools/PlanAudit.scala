package graft.tools

import graft.{GraftSession, SparkEntry}

/** Anti-pattern sweep over EVERY driver query's physical plan: counts the
  * operators that decide 100 TB behavior (shuffles, broadcasts, sorts) and
  * flags the ones that should never appear outside a labeled kernel
  * (cartesian products, broadcast nested-loop joins). Run after plan-shaping
  * changes; the audit is advisory — the labeled all-pairs verification
  * kernels legitimately nested-loop.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // Audited exceptions — every nested-loop below has a BOUNDED broadcast
    // side by construction:
    //   - dedup_jaccard/dedup_embedding: all-pairs verification kernels,
    //     quadratic BY DESIGN, bucketed scale path implemented beside them;
    //   - sim_topk/sim_ivf*: deliberate crossJoin(broadcast(querySet)) /
    //     broadcast(centroids) — the corpus side streams, never shuffles;
    // The merge queries are deliberately NOT here: their joins must plan as
    // hash joins (their fixtures seed lookups as LocalRelation DATA rows —
    // literal-column seeds would FoldablePropagation-fold the join keys
    // away and degrade to BNLJ, as would a broadcast hint on the product
    // upsert's full outer).
    val kernelAllowlist = Set("dedup_jaccard", "dedup_embedding",
      "sim_topk", "sim_ivf", "sim_ivf_trained")
    val spark = GraftSession.get("local[8]")
    var flagged = List.empty[String]
    println(f"${"query"}%-28s shuf bcast sort cart bnlj")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def c(s: String) = plan.sliding(s.length).count(_ == s)
        val cart = c("CartesianProduct")
        val bnlj = c("BroadcastNestedLoopJoin")
        println(f"$name%-28s ${c("Exchange hashpartitioning")}%4d ${c("BroadcastExchange")}%5d " +
          f"${c("Sort ")}%4d $cart%4d $bnlj%4d")
        if ((cart > 0 || bnlj > 0) && !kernelAllowlist.contains(name))
          flagged ::= s"$name: cartesian=$cart bnlj=$bnlj"
      } catch { case e: Exception => println(f"$name%-28s ERROR ${e.getMessage.take(80)}") }
    }
    println(if (flagged.isEmpty) "\nAUDIT CLEAN: no unlabeled cartesian/nested-loop joins"
      else s"\nAUDIT FLAGS:\n${flagged.mkString("\n")}")
    spark.stop()
  }
}
