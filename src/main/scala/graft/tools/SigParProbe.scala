package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scratch probe: is the per-batch dedup-stream cost COMPUTE at input-file
  * parallelism (a 1-file micro-batch = 1-3 tasks on 32 cores), not stage
  * waves? Times the batch signature scan and the verification shingle scan
  * at source partitioning vs spread over the cores.
  */
object SigParProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().appName("sig-par-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
    val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 2)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sigpar] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { rep =>
      println(s"[sigpar] --- rep $rep: batch partitions=${batch.rdd.getNumPartitions}")
      t(s"sigs @source-par")(noop(Dedup.minhashSignatures(batch, "doc_id", "text", 5, 8)))
      t(s"sigs @32-par")(noop(Dedup.minhashSignatures(
        batch.repartition(32), "doc_id", "text", 5, 8)))
      t(s"shingles @source-par")(noop(batch.select(col("doc_id"),
        graft.operators.TextOps.distinctShingles(col("text"), 5).as("sh"))))
      t(s"shingles @32-par")(noop(batch.repartition(32).select(col("doc_id"),
        graft.operators.TextOps.distinctShingles(col("text"), 5).as("sh"))))
    }
    spark.stop()
  }
}
