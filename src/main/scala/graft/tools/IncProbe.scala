package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** One-off phase profiler for the incremental-dedup path vs the full-corpus
  * run — keeps the bench honest about "incremental is cheaper per batch".
  */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder().appName("inc-probe").getOrCreate()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    val split = (docs.agg(max(col("doc_id"))).head().getLong(0) + 1) * 4 / 5
    val corpus = docs.filter(col("doc_id") < split)
    val fresh = docs.filter(col("doc_id") >= split)
    def full() = Dedup.lshVerifiedPairs(docs, "doc_id", "text", k = 5,
      numHashes = 8, rowsPerBand = 2, minJaccard = 0.35,
      minSigMatchesOverride = 4).count()
    def inc() = Dedup.incrementalLshVerifiedPairs(corpus,
      Dedup.minhashSignatures(corpus, "doc_id", "text"), fresh, "doc_id",
      "text", k = 5, numHashes = 8, rowsPerBand = 2, minJaccard = 0.35,
      minSigMatchesOverride = 4).count()
    for (round <- 1 to 2) {
      time(s"full r$round")(full())
      time(s"inc  r$round")(inc())
    }
    // sigs cost WITHOUT count-pruning: aggregate over a sig column
    time("corpus sigs (unpruned)") {
      Dedup.minhashSignatures(corpus, "doc_id", "text")
        .agg(sum(col("mh0"))).head()
    }
    spark.stop()
  }
}
