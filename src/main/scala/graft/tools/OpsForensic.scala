package graft.tools
import java.nio.file.Files
import graft.sources.AtomicWarehouse
import graft.streaming.ExactDedupStream
import org.apache.spark.sql.functions._
object OpsForensic {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("local[16]")
    import spark.implicits._
    (1 to 5).foreach { round =>
      val dir = Files.createTempDirectory("graft-forensic-").toString
      val wh = new AtomicWarehouse(spark, dir, logFoldEvery = 8)
      val xs = new ExactDedupStream(wh)
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select($"doc_id".cast("long").as("doc_id"), $"text")
        .orderBy("doc_id").limit(100).as[(Long, String)].collect().toSeq
      @volatile var streaming = true
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val ops = Future {
        var passes = 0
        try { while (streaming) { Maintain.run(spark, dir, Nil, graceMs = 60000); passes += 1 }; Right(passes) }
        catch { case e: Throwable => Left(e) }
      }
      try docs.grouped(5).foreach(c => xs.processBatch(c.toDF("doc_id", "text")))
      catch { case e: Throwable => println(s"STREAM FAILED: $e") }
      streaming = false
      Await.result(ops, Duration.Inf) match {
        case Right(p) => println(s"round $round OK, $p maintain passes")
        case Left(e) =>
          println(s"round $round OPS FAILED: ${e.getMessage.take(300)}")
          println("=== txlog ===")
          val log = java.nio.file.Paths.get(dir, "_txlog")
          graft.LocalFs.entriesSorted(log).foreach { p =>
            println(s"--- $p")
            if (p.toString.endsWith(".tsv")) println(new String(Files.readAllBytes(p)))
          }
          println("=== survivors dir ===")
          graft.LocalFs.entriesSorted(
              java.nio.file.Paths.get(dir, "dedup", "ExactSurvivors"))
            .foreach(p => println(s"  ${p.getFileName} mtime=${Files.getLastModifiedTime(p)}"))
          sys.exit(1)
      }
    }
    spark.stop()
  }
}
