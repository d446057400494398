package graft.tools

import graft.GraftSession
import graft.operators.PersistedPostings
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Phase-level wall breakdown of the `etl_fts_sync` lifecycle — where the
  * index-as-MV query's fixture wall actually goes (seed build vs DML vs
  * per-commit sync vs BM25 query), so optimization lands on the measured
  * phase rather than the guessed one. Run:
  * `sbt "runMain graft.tools.FtsSyncProbe [sfDir]"`.
  */
object FtsSyncProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.builder().appName("fts-sync-probe").getOrCreate()
    import s.implicits._
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    docs.count()
    val queries = Seq(
      (1L, "merge join order sort"),
      (2L, "vector window stream"),
      (3L, "customer data value zzz")).toDF("q_id", "qtext")
    val wh = new graft.sources.AtomicWarehouse(s,
      java.nio.file.Files.createTempDirectory("graft-ftsmv-probe-").toString)
    wh.setChangeFeed("corpus", on = true)
    val fts = new PersistedPostings(wh)
    phase("build-empty")(fts.build(docs.limit(0), "doc_id", "text"))
    val mv = new graft.streaming.FtsSync(wh, "corpus", docs.schema,
      "doc_id", "text", fts) {
      override protected def applyCommit(outIds: Seq[Long],
          in: Option[org.apache.spark.sql.DataFrame], version: Long): Unit =
        phase(s"  apply v$version out=${outIds.size} in=${in.isDefined}")(
          super.applyCommit(outIds, in, version))
    }
    phase("append-corpus")(wh.append("corpus", docs.coalesce(1)))
    phase("sync-seed")(mv.sync())
    val m = docs.agg(max(col("doc_id"))).head().getLong(0)
    def idsWhere(c: org.apache.spark.sql.Column): Seq[Long] =
      docs.filter(c).select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    phase("dml-update")(wh.updateWhere("corpus", docs.schema,
      Seq(graft.sources.ColIn("doc_id", idsWhere(col("doc_id") % 13 === 0))),
      Seq("text" -> concat(col("text"), lit(" zzz zzz")))))
    phase("dml-delete-dv")(wh.deleteWhereDv("corpus", docs.schema,
      Seq(graft.sources.ColIn("doc_id",
        idsWhere(col("doc_id") % 17 === 0 && col("doc_id") % 13 =!= 0)))))
    phase("dml-merge")(wh.mergeInto("corpus", docs.schema, Seq(
        (1L, "customer data value zzz"),
        (m + 1L, "zzz window stream"),
        (m + 2L, "alpha omega")).toDF("doc_id", "text"), Seq("doc_id")))
    phase("sync-window")(mv.sync())
    val nDocs = phase("corpus-stats")(
      fts.corpusStats().agg(sum(col("n"))).head().getLong(0))
    phase("bm25-query")(fts.query(queries, "q_id", "qtext", k = 10)
      .select(col("q_id"), col("rank").cast(LongType).as("rank"),
        col("id").as("doc_id"), col("bm25"))
      .withColumn("n_docs", lit(nDocs))
      .orderBy(col("q_id"), col("rank")).collect())
    s.stop()
  }
}
