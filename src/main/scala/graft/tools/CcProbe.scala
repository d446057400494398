package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.functions._

object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("local[32]")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    var t0 = System.nanoTime()
    val pairs = Dedup.lshVerifiedPairs(docs, "doc_id", "text",
      k = 5, numHashes = 8, rowsPerBand = 2, minJaccard = 0.35, minSigMatchesOverride = 4)
      .persist()
    println(s"pairs=${pairs.count()} in ${(System.nanoTime()-t0)/1e9}s")
    t0 = System.nanoTime()
    val comps = Dedup.connectedComponents(pairs)
    println(s"components rows=${comps.count()} in ${(System.nanoTime()-t0)/1e9}s")
    println(s"clusters=${comps.select(countDistinct(col("component"))).head.getLong(0)}")
    spark.stop()
  }
}
