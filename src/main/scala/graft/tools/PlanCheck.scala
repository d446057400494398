package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump formatted physical plans for the headline queries — the review loop
  * for pushdown / broadcast / whole-stage-codegen (run after any plan-shaping
  * change; `sbt "runMain graft.tools.PlanCheck q1_pricing_summary ..."`).
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q2_filter_topk", "q3_join_revenue",
        "q8_merge_upsert", "dedup_lsh_pairs", "sim_topk", "etl_clean")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get("local[8]")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
