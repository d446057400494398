package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot join keys. AQE's skew-join split (enabled in
  * GraftSession) covers sort-merge joins at runtime; explicit salting is the
  * plan-level tool when one side can be replicated — e.g. joining a 100 TB
  * fact against a medium dimension where a handful of keys carry most rows
  * (the classic "null key / default provider" hot spot in training-data
  * joins).
  *
  * `saltedJoin` appends a salt in [0, factor) to the big side's key and
  * explodes the small side across all salt values, turning one hot partition
  * into `factor` even ones. Semantically identical to the plain inner join.
  */
object Skew {

  /** Inner-join `big` with `small` on `key`, salting the hot keys. `small`
    * is replicated `factor`× — keep it dimension-sized.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(factor)))
    val replicated = small.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("__salt", col("__salt").cast("bigint"))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Diagnostic: per-key row counts of the heaviest keys (run before choosing
    * a salt factor; keys carrying ≫ rows/partitions need salting).
    */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
}
