package graft.tools

import graft.GraftSession
import graft.operators.PersistedPostings
import org.apache.spark.sql.functions._

/** Wall-clock decomposition of the etl_fts_sync fixture: which lifecycle
  * step carries the cost (index build, corpus append, seed sync, the three
  * DML ops, the DML sync, the BM25 query). Pairs with QueryProbe's job
  * histogram to separate job time from driver-side (plan/manifest/commit)
  * time per step.
  */
object FtsSyncProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().appName("fts-probe2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    (1 to 2).foreach { rep =>
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val corpus = docs.select(col("doc_id"), col("text"))
      val wh = new graft.sources.AtomicWarehouse(spark,
        java.nio.file.Files.createTempDirectory("graft-ftsp2-").toString)
      wh.setChangeFeed("corpus", on = true)
      val fts = new PersistedPostings(wh)
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[ftsp2 rep$rep] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      t("build(empty)")(fts.build(corpus.limit(0), "doc_id", "text"))
      val mv = new graft.streaming.FtsSync(wh, "corpus", corpus.schema,
        "doc_id", "text", fts)
      t("append corpus")(wh.append("corpus", corpus.coalesce(1)))
      t("sync #1 (seed)")(mv.sync())
      val m = docs.agg(max(col("doc_id"))).head().getLong(0)
      def idsWhere(c: org.apache.spark.sql.Column): Seq[Long] =
        docs.filter(c).select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      t("updateWhere")(wh.updateWhere("corpus", corpus.schema,
        Seq(graft.sources.ColIn("doc_id", idsWhere(col("doc_id") % 13 === 0))),
        Seq("text" -> concat(col("text"), lit(" zzz zzz")))))
      t("deleteWhereDv")(wh.deleteWhereDv("corpus", corpus.schema,
        Seq(graft.sources.ColIn("doc_id",
          idsWhere(col("doc_id") % 17 === 0 && col("doc_id") % 13 =!= 0)))))
      t("mergeInto")(wh.mergeInto("corpus", corpus.schema, Seq(
          (1L, "customer data value zzz"),
          (m + 1L, "zzz window stream"),
          (m + 2L, "alpha omega")).toDF("doc_id", "text"), Seq("doc_id")))
      t("sync #2 (3 commits)")(mv.sync())
      val queries = Seq(
        (1L, "merge join order sort"),
        (2L, "vector window stream"),
        (3L, "customer data value zzz")).toDF("q_id", "qtext")
      t("corpusStats+query")(
        fts.query(queries, "q_id", "qtext", k = 10)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
