package graft

import java.nio.file.Files

/** Co-located joins via bucketing: pre-bucket both sides on the join key and
  * the join runs with NO shuffle exchange — the physical pattern for repeated
  * 100 TB fact-to-fact joins where broadcast is impossible.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two bucketed tables runs without a shuffle exchange") {
    val base = Files.createTempDirectory("graft-bucket-").toString
    val left = spark.range(0, 10000).select($"id".as("k"), ($"id" * 2).as("v1"))
    val right = spark.range(0, 10000).select($"id".as("k"), ($"id" * 3).as("v2"))

    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    left.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$base/left").saveAsTable("bkt_left")
    right.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$base/right").saveAsTable("bkt_right")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
