package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are fully materialized through the `noop`
  * sink (a plain count() would let Catalyst prune away the very columns the
  * query exists to compute).
  *
  * Each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and reports the
  * MEDIAN; the per-rep numbers are kept in the JSON under "reps". Single-shot
  * numbers on a shared session proved untrustworthy: reruns of an identical
  * binary swung individual queries 2-4x in both directions (GC, codegen
  * cache, page cache, compaction of neighbors' temp dirs), which a median of
  * consecutive reps absorbs. SPARK_GRAFT_ONLY=a,b,c restricts the run for
  * single-query attribution work.
  */
object Bench {
  private def median(ts: Seq[Double]): Double = {
    val s = ts.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark: SparkSession = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    // warm the JVM/codegen once on the smallest sf so per-query numbers
    // measure the plan, not first-run classloading
    qs.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // Per-rep outcome is tracked: a rep whose query throws records the error,
    // NOT its (fast-fail) elapsed time — a broken query must not contribute
    // near-zero times that deflate the median and make the JSON look healthy.
    val results = qs.map { case (name, fn) =>
      val reps0 = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Right((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      }
      (name, reps0.collect { case Right(t) => t }, reps0.collect { case Left(m) => m })
    }
    val medians = results.collect { case (k, ts, _) if ts.nonEmpty => k -> median(ts) }
    val qsJson = medians.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val repsJson = results.collect { case (k, ts, _) if ts.nonEmpty =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    val errsJson = results.collect { case (k, _, ms) if ms.nonEmpty =>
      "\"" + k + "\":\"" + esc(ms.head) + s""" (${ms.size}/$reps reps failed)""""
    }.mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    val line =
      f"""{"metric":"total_runtime","value":$total%.3f,"unit":"sec","queries":$qsJson,"reps":$repsJson,"errors":$errsJson,"sf":"$sfDir"}"""
    println(line)
    // stdout alone proved lossy (the driver's tail-capture truncated r5's
    // artifact); the bench is its own evidence, so persist the line too
    val out = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
