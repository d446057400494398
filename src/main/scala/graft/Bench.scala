package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against SPARK_GRAFT_SF_DIR and
  * prints one JSON summary line. Results are fully materialized through the
  * `noop` sink (a plain count() would let Catalyst prune away the very columns
  * the query exists to compute).
  *
  * Each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and reports the
  * MEDIAN; the per-rep numbers are kept in the JSON under "reps". Single-shot
  * numbers on a shared session proved untrustworthy: reruns of an identical
  * binary swung individual queries 2-4x in both directions (GC, codegen
  * cache, page cache, compaction of neighbors' temp dirs), which a median of
  * consecutive reps absorbs. SPARK_GRAFT_ONLY=a,b,c restricts the run for
  * single-query attribution work.
  *
  * Evidence robustness (BENCH_r06 was killed at rc:124 after ≥39 min with the
  * whole artifact lost — the JSON was written only once, at the end):
  *   - SPARK_GRAFT_BENCH_OUT is JSONL, appended and fsync'd one line per
  *     query THE MOMENT that query's reps finish; the final line is the same
  *     summary printed to stdout. A kill -9 mid-run leaves a valid partial
  *     JSONL with every completed query's medians intact.
  *   - Each query gets a wall-clock budget (SPARK_GRAFT_BENCH_BUDGET_S,
  *     default 150 s across all reps — the slowest r6 median was 14.4 s, so
  *     10× headroom). On breach the query's job group is cancelled, active
  *     streams are stopped, "timeout" is recorded, and the run MOVES ON
  *     instead of stalling everything after it.
  *   - The stream fixtures' drain guard is lowered to 120 s for the bench
  *     via GraftSession.streamDrainTimeoutMs (3 streams × 3 reps × 300 s of
  *     legal stalling is how r6 died); SPARK_GRAFT_STREAM_DRAIN_MS overrides.
  *   - Every query line carries an environment canary (the same fixed
  *     CPU-bound range-sum timed immediately before EACH rep, as
  *     "rep_canary_s" plus "rep_load1m"; "canary_s" is their median and
  *     "load1m" the rep max); STREAMING queries (name contains stream/sync)
  *     additionally carry a per-rep DRAIN canary ("rep_drain_s"/"drain_s"):
  *     a fixed 3-micro-batch AvailableNow drain over a canned dir, timed
  *     the same way, because the CPU canary is blind to the scheduler/WAL
  *     latency that dominates micro-batch drain floors (the r16
  *     etl_scd2_stream ambiguity): cross-round medians can then be adjudicated
  *     as real (canary flat, query slower) or environmental (canary inflated
  *     on exactly the slow reps) — the r6 q10/q11_stream "regression" was
  *     contention on identical code, indistinguishable at the time because
  *     nothing measured the machine, and r7's etl_merge_endstate rep shape
  *     (first rep fast, later reps 4× slower) was invisible to a
  *     once-per-query sample.
  *   - Reps whose spread says the median is noise (max/min > 2.5×), or whose
  *     own canaries ran >2× the run's canary median (contention on exactly
  *     the measured reps), trigger up to 2 extra reps within the same budget
  *     ("adaptive_reps" in the line).
  *   - Alongside the raw median every query reports "median_clean" — the
  *     canary-gated median ([[cleanMedian]]): contention on a subset of reps
  *     can no longer put a contaminated number on record as THE number (r9's
  *     doc_stats median straddled two inflated reps while its clean reps sat
  *     at 0.6 s). Clean is CAPPED at the raw median (r17: when most reps
  *     carried inflated canaries, the selector kept one slow "clean" rep and
  *     reported 14.7 against a raw median of 4.1).
  *   - Every summary line (full, compact, BENCHBOOK) echoes "cpus" — the
  *     honored $SPARK_GRAFT_CPUS — so the driver's scaling comparison can
  *     verify from the artifact alone that the low-core run really ran at
  *     the low core count (r17 flagged suspect_cpus_ignored because nothing
  *     in the output demonstrated the honored contract).
  *   - A FULL run (no SPARK_GRAFT_ONLY filter) appends one line per round to
  *     the git-tracked BENCHBOOK.jsonl: `{"round":N,"sf":...,
  *     "data_fingerprint":{table:{bytes,rows}},"medians_clean":{...},
  *     "medians":{...},...}`. The driver's BENCH_r*.json keeps only a
  *     2,000-char tail, which truncates the alphabetically-early dedup/doc
  *     block — the engine's most expensive queries had no committed
  *     cross-round history before the book. The data fingerprint records
  *     WHICH testdata was measured (the driver regenerates it between
  *     rounds), so cross-round deltas can separate code drift from data
  *     drift.
  *   - The LAST stdout line is a compact (<2 KB) self-adjudicating summary
  *     sized to survive the driver's tail capture intact: total raw + clean
  *     runtime, run-wide canary min/median/max, the slowest-10 medians, and
  *     a "flagged" object naming every query whose number needs adjudication
  *     (adaptive reps fired, or raw median >1.3× its canary-gated clean
  *     median) with raw/clean/worst-rep-canary-inflation in-row — r15's
  *     out-of-band dedup_components sample had to be adjudicated from side
  *     files because the official artifact held only a truncated fragment.
  */
object Bench {
  private[graft] def median(ts: Seq[Double]): Double = {
    val s = ts.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Canary-gated median: the median over only the reps whose own canary ran
    * ≤ 1.5× the run's canary median (i.e. the machine was quiet while THAT
    * rep was measured). With fewer than 2 clean reps the min over all reps is
    * reported instead — under contention the minimum is the least-inflated
    * sample, and a contaminated median (r9: doc_stats' five reps were
    * 0.595/0.618/1.919/3.766/4.308 with canaries flat/flat/flat/2.5×/2.2×,
    * and the raw median landed on the 1.919 straddler) should never be the
    * only number on record. `times` and `canaries` are index-aligned (one
    * canary timed immediately before each successful rep); `baseCanary ≤ 0`
    * (no baseline yet) gates nothing out.
    */
  private[graft] def cleanMedian(times: Seq[Double], canaries: Seq[Double],
      baseCanary: Double): Option[Double] = {
    if (times.isEmpty) None
    else {
      val clean = times.zip(canaries)
        .collect { case (t, c) if baseCanary <= 0 || c <= 1.5 * baseCanary => t }
      // Capped at the RAW median: the gate exists to remove contention
      // inflation, so "clean" must never be the WORSE number — r17's official
      // run recorded dedup_components_incremental clean 14.68 vs raw median
      // 4.15 because most reps carried inflated canaries and the selector
      // kept the one slow "clean" rep as the clean median.
      if (clean.size >= 2) Some(math.min(median(clean), median(times)))
      else Some(times.min)
    }
  }

  /** Identity of the benched data: per-table on-disk bytes + footer row
    * counts. The driver regenerates /root/testdata between rounds (the r8↔r9
    * comparison silently straddled one — events.ts even changed type), so
    * every BENCHBOOK line records what was measured: cross-round deltas can
    * then distinguish code drift from data drift. Row counts come from a
    * zero-column scan — the parquet reader answers it from footer metadata,
    * no data pages read.
    */
  private[graft] def dataFingerprint(spark: SparkSession, sfDir: String): String = {
    val dir = java.nio.file.Paths.get(sfDir)
    if (!java.nio.file.Files.isDirectory(dir)) return "{}"
    val tables = {
      val s = java.nio.file.Files.list(dir)
      try {
        val b = Vector.newBuilder[java.nio.file.Path]
        val it = s.iterator(); while (it.hasNext) b += it.next()
        b.result()
      } finally s.close()
    }.filter(_.getFileName.toString.endsWith(".parquet"))
      .sortBy(_.getFileName.toString)
    tables.map { p =>
      val name = p.getFileName.toString.stripSuffix(".parquet")
      val bytes = {
        val s = java.nio.file.Files.walk(p)
        try {
          var total = 0L
          val it = s.iterator()
          while (it.hasNext) { val q = it.next(); if (java.nio.file.Files.isRegularFile(q)) total += java.nio.file.Files.size(q) }
          total
        } finally s.close()
      }
      val rows = try spark.read.parquet(p.toString).count()
        catch { case _: Throwable => -1L }
      s""""$name":{"bytes":$bytes,"rows":$rows}"""
    }.mkString("{", ",", "}")
  }

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val budgetMs = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "150").toLong * 1000
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // lower the stream-drain guard for bench runs unless explicitly set
    if (sys.env.get("SPARK_GRAFT_STREAM_DRAIN_MS").isEmpty &&
        sys.props.get("graft.stream.drain.ms").isEmpty)
      sys.props("graft.stream.drain.ms") = "120000"
    val spark: SparkSession = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.deleteIfExists(outPath)
    // append + force-to-disk per line: a later kill (even -9) cannot take
    // already-flushed query lines with it
    def appendTo(p: java.nio.file.Path, line: String): Unit = {
      import java.nio.file.StandardOpenOption._
      val ch = java.nio.channels.FileChannel.open(p, CREATE, WRITE, APPEND)
      try { ch.write(java.nio.ByteBuffer.wrap((line + "\n").getBytes("UTF-8"))); ch.force(false) }
      finally ch.close()
    }
    def appendLine(line: String): Unit = appendTo(outPath, line)

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    // One rep, run on a daemon thread so a stall can be abandoned: the job
    // group is set inside the thread (thread-local) and cancelled by name on
    // breach. Streams run their batches on their own threads, which do NOT
    // inherit the group — stopping active streams covers those.
    val pool = java.util.concurrent.Executors.newCachedThreadPool(
      (r: Runnable) => { val t = new Thread(r, "bench-rep"); t.setDaemon(true); t })
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    def runRep(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String, remainingMs: Long): Either[String, Double] = {
      import scala.concurrent.duration._
      val group = s"bench-$name"
      // leftovers from an abandoned (timed-out) rep poison later reps with
      // name collisions on memory-sink streams — sweep before starting
      // (stop() waits for termination; a no-op when nothing is active).
      // The sweep goes through GraftSession: stream fixtures run on isolated
      // newSession()s whose queries register in their OWN per-session
      // StreamingQueryManager, invisible to spark.streams.active here.
      GraftSession.stopAllStreams(spark)
      val t0 = System.nanoTime()
      val fut = scala.concurrent.Future {
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        try fn(spark, dir).write.format("noop").mode("overwrite").save()
        finally spark.sparkContext.clearJobGroup()
      }
      try {
        scala.concurrent.Await.result(fut, remainingMs.max(1).millis)
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          System.err.println(s"[bench] $name exceeded its ${budgetMs / 1000} s budget; cancelling")
          spark.sparkContext.cancelJobGroup(group)
          // The abandoned thread may START a stream after a one-shot sweep
          // (observed: the next rep then dies on a queryName collision), so
          // sweep in a bounded loop until the thread actually finishes.
          var waitedMs = 0
          while (!fut.isCompleted && waitedMs < 15000) {
            GraftSession.stopAllStreams(spark)
            Thread.sleep(250); waitedMs += 250
          }
          Left("timeout")
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    }

    // warm the JVM/codegen once on the smallest sf so per-query numbers
    // measure the plan, not first-run classloading (budget applies here too —
    // a warmup stall must not eat the run)
    qs.foreach { case (name, fn) => runRep(name, fn, "/root/testdata/sf0.001", budgetMs) }

    // Environment canary: the SAME fixed CPU-bound job (sum over a 200M
    // range — no I/O, no shuffle, deterministic) timed immediately before
    // each query, plus the 1-min system load average. Round-over-round bench
    // deltas have twice been mis-attributed to code (r6: q10/q11_stream read
    // 1.5-1.7× vs r5 on identical code paths; cause was machine contention);
    // a per-query canary puts the contention measurement IN the artifact, so
    // a regression can be adjudicated as real (canary flat, query slower) or
    // environmental (canary inflated too) without re-running anything.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    canary() // once untimed: first call pays codegen for the canary itself

    // DRAIN canary: a fixed 3-micro-batch AvailableNow drain (one tiny
    // parquet file per batch, noop sink, fresh checkpoint every call) timed
    // immediately before each rep of STREAMING queries. The CPU-sum canary
    // is blind to the scheduler/WAL/file-listing latency that dominates
    // micro-batch drain floors — r16's etl_scd2_stream flag could not be
    // adjudicated from the CPU canary alone (clean canaries, inflated
    // drains under load1m 3.4-4.4). This one measures exactly that floor,
    // so streaming rows self-adjudicate latency noise the way every row
    // already self-adjudicates CPU contention.
    val drainDir = java.nio.file.Files.createTempDirectory("graft-bench-drain-").toString
    (0 until 3).foreach { i =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-bench-drain-c$i-").toString + "/out"
      spark.range(1).coalesce(1).write.parquet(tmp)
      java.nio.file.Files.move(LocalFs.onlyParquet(tmp),
        java.nio.file.Paths.get(drainDir, f"c$i%02d.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def drainCanary(): Double = {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-bench-drainck-").toString
      val t0 = System.nanoTime()
      val q = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))))
        .option("maxFilesPerTrigger", "1").parquet(drainDir)
        .writeStream.format("noop").option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      if (!q.awaitTermination(60000)) q.stop()
      (System.nanoTime() - t0) / 1e9
    }
    drainCanary() // once untimed: first call pays stream-machinery warmup

    // Per-rep outcome is tracked: a rep whose query throws records the error,
    // NOT its (fast-fail) elapsed time — a broken query must not contribute
    // near-zero times that deflate the median and make the JSON look healthy.
    //
    // The canary + load sample run per REP (not once per query): a query
    // whose first rep is fast and later reps are 4× slower — exactly the
    // r7 etl_merge_endstate shape — is invisible to a once-before-the-reps
    // sample, so a contended rep could never self-identify in the artifact.
    // The query-level "canary_s" stays (median of the rep canaries) so
    // cross-round comparisons keep working; "load1m" reports the rep max.
    // every rep canary across the whole run: the baseline for the per-query
    // contention trigger below (a contended rep's canary is judged against
    // the run's typical canary, not an absolute number)
    val allRepCanaries = scala.collection.mutable.ArrayBuffer[Double]()
    val results = qs.map { case (name, fn) =>
      val qStart = System.nanoTime()
      // streaming queries get the drain canary too — their floor is the
      // micro-batch machinery the CPU canary cannot see
      val isStreaming = name.contains("stream") || name.contains("sync")
      var outcomes = Vector.empty[Either[String, Double]]
      var repCanaries = Vector.empty[Double]
      var repDrains = Vector.empty[Double]
      var repLoads = Vector.empty[Double]
      def runOne(): Unit = {
        val remaining = budgetMs - (System.nanoTime() - qStart) / 1000000
        // a timed-out rep ends the query (its successor would stall the same
        // way); a budget exhausted by SLOW-BUT-FINISHED reps just means fewer
        // reps feed the median
        if (remaining > 0 && !outcomes.contains(Left("timeout"))) {
          val c = canary()
          repCanaries :+= c
          allRepCanaries += c
          if (isStreaming) repDrains :+= drainCanary()
          repLoads :+= osBean.getSystemLoadAverage
          outcomes :+= runRep(name, fn, sfDir, remaining)
        }
      }
      (1 to reps).foreach(_ => runOne())
      // Adaptive reps: up to 2 extra reps within the same wall budget when
      // the median looks untrustworthy. Two triggers:
      //   - spread: max/min > 2.5 (r8's dedup_components 4.36/12.93/7.21 —
      //     spread 2.97 — slipped under the old 3.0 threshold with rising
      //     per-rep load saying contention);
      //   - canary inflation: any rep's canary > 2× the run's canary median
      //     so far (r8's dedup_embedding_lsh reps carried 2.4×-inflated
      //     canaries with a spread the old rule never saw).
      var extra = 0
      def spreadBad: Boolean = {
        val ts = outcomes.collect { case Right(t) => t }
        ts.size >= 2 && ts.min > 0 && ts.max / ts.min > 2.5
      }
      def canaryInflated: Boolean = allRepCanaries.size >= 6 && {
        val base = median(allRepCanaries.toVector)
        base > 0 && repCanaries.exists(_ > 2 * base)
      }
      while (extra < 2 && (spreadBad || canaryInflated)) { runOne(); extra += 1 }
      val ts = outcomes.collect { case Right(t) => t }
      val errs = outcomes.collect { case Left(m) => m }
      // times paired with the canary sampled immediately before each rep
      // (index-aligned: one canary per runOne(), failed reps drop out of both)
      val tcPairs = outcomes.zip(repCanaries).collect { case (Right(t), c) => (t, c) }
      val canaryS = if (repCanaries.nonEmpty) median(repCanaries) else 0.0
      val loadAvg = if (repLoads.nonEmpty) repLoads.max else 0.0
      val repsJson = ts.map(t => f"$t%.3f").mkString("[", ",", "]")
      val envJson = f""""canary_s":$canaryS%.3f,"load1m":$loadAvg%.1f""" +
        repCanaries.map(c => f"$c%.3f").mkString(""","rep_canary_s":[""", ",", "]") +
        (if (repDrains.nonEmpty)
          f""","drain_s":${median(repDrains)}%.3f""" +
            repDrains.map(d => f"$d%.3f").mkString(""","rep_drain_s":[""", ",", "]")
         else "") +
        repLoads.map(l => f"$l%.1f").mkString(""","rep_load1m":[""", ",", "]") +
        (if (extra > 0) s""","adaptive_reps":$extra""" else "")
      // per-query line gates on the run-so-far canary median (all that exists
      // if the run dies here); the end-of-run summary/BENCHBOOK recompute
      // with the full-run baseline
      val baseSoFar = median(allRepCanaries.toVector)
      val qLine =
        if (ts.nonEmpty) {
          val mc = cleanMedian(tcPairs.map(_._1), tcPairs.map(_._2), baseSoFar).get
          f"""{"query":"$name","median":${median(ts)}%.3f,"median_clean":$mc%.3f,"reps":$repsJson,$envJson}"""
        } else
          s"""{"query":"$name","median":null,"reps":$repsJson,$envJson,"error":"${esc(errs.head)}"}"""
      appendLine(qLine)
      println(s"[bench] $qLine")
      (name, ts, errs, canaryS, tcPairs, extra, repDrains)
    }
    val medians = results.collect { case (k, ts, _, _, _, _, _) if ts.nonEmpty => k -> median(ts) }
    val qsJson = medians.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val runBase = {
      val all = results.flatMap(_._5.map(_._2))
      if (all.nonEmpty) median(all) else 0.0
    }
    val qsCleanJson = results.collect { case (k, ts, _, _, tc, _, _) if ts.nonEmpty =>
      "\"" + k + f"\":${cleanMedian(tc.map(_._1), tc.map(_._2), runBase).get}%.3f"
    }.mkString("{", ",", "}")
    val repsJson = results.collect { case (k, ts, _, _, _, _, _) if ts.nonEmpty =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errsJson = results.collect { case (k, _, ms, _, _, _, _) if ms.nonEmpty =>
      "\"" + k + "\":\"" + esc(ms.head) + s""" (${ms.size}/$reps reps failed)""""
    }.mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    val canaryMedian = if (results.nonEmpty) median(results.map(_._4)) else 0.0
    val line =
      f"""{"metric":"total_runtime","value":$total%.3f,"unit":"sec","queries":$qsJson,"queries_clean":$qsCleanJson,"reps":$repsJson,"errors":$errsJson,"canary_median_s":$canaryMedian%.3f,"cpus":$cpus,"sf":"$sfDir"}"""
    println(line)
    appendLine(line) // final JSONL line = the summary; partial file is still valid JSONL
    // cross-round bench book: one tracked line per FULL run. Round number
    // from SPARK_GRAFT_ROUND when the driver provides it (non-numeric values
    // fall through to inference), else inferred from the committed
    // BENCH_r<N>.json artifacts NEXT TO the book file — not the cwd, so a
    // run launched outside the repo root can't misnumber the tracked history
    // (the round-N artifact lands AFTER round N's bench runs, so max+1 is
    // the in-flight round). `medians` stays the LAST key: ContractDocsSpec's
    // latest-line query-name extraction captures from `"medians":{` to the
    // end of the line.
    //
    // A round can legitimately record SEVERAL full runs (r10 ran one
    // mid-round and one final): every line carries a unique `run_id` and a
    // monotone `ts`, and the documented contract for cross-round tooling is
    // LAST LINE PER ROUND WINS — ContractDocsSpec gates the ts ordering
    // that makes "last" well-defined.
    val runId = java.util.UUID.randomUUID().toString.take(8)
    if (only.isEmpty) {
      val bookPath = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCHBOOK", "BENCHBOOK.jsonl")).toAbsolutePath
      val round = sys.env.get("SPARK_GRAFT_ROUND")
        .flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse {
          val scanDir = Option(bookPath.getParent).getOrElse(java.nio.file.Paths.get("."))
          val s = java.nio.file.Files.list(scanDir)
          val names = try {
            val b = Vector.newBuilder[String]
            val it = s.iterator(); while (it.hasNext) b += it.next().getFileName.toString
            b.result()
          } finally s.close()
          val rs = names.collect { case n if n.matches("BENCH_r\\d+\\.json") =>
            n.stripPrefix("BENCH_r").stripSuffix(".json").toInt }
          (rs :+ 0).max + 1
        }
      val fpJson = dataFingerprint(spark, sfDir)
      val bookLine = f"""{"round":$round,"run_id":"$runId","sf":"$sfDir","ts":${System.currentTimeMillis() / 1000},"canary_median_s":$canaryMedian%.3f,"total_s":$total%.3f,"cpus":$cpus,"data_fingerprint":$fpJson,"medians_clean":$qsCleanJson,"medians":$qsJson}"""
      appendTo(bookPath, bookLine)
    }
    // The LAST stdout line is a COMPACT self-adjudicating summary. The full
    // line above outgrew the driver's stdout-tail capture rounds ago (the
    // official BENCH_r*.json has carried a truncated, unparseable tail since
    // r12 — the 30 s dedup_components sample in r15 could only be adjudicated
    // from side files). This line stays under ~1.9 KB so the official
    // artifact parses again, and it carries the adjudication context IN-ROW:
    // run-wide canary spread, every flagged query (adaptive reps fired, or
    // raw median diverges >1.3× from its canary-gated clean median) with its
    // raw/clean medians and worst rep-canary inflation, and the run_id
    // linking back to the full per-rep record in BENCHBOOK.jsonl.
    val (cMin, cMax) =
      if (allRepCanaries.nonEmpty) (allRepCanaries.min, allRepCanaries.max) else (0.0, 0.0)
    // run-wide drain baseline: median over every streaming rep's drain
    // canary, so a flagged streaming row can show drain inflation the way
    // every row shows CPU-canary inflation
    val drainBase = {
      val all = results.flatMap(_._7)
      if (all.nonEmpty) median(all) else 0.0
    }
    val flaggedAll = results.collect {
      case (k, ts, _, _, tc, extra, drains) if ts.nonEmpty &&
          (extra > 0 || {
            val c = cleanMedian(tc.map(_._1), tc.map(_._2), runBase).get
            c > 0 && median(ts) / c > 1.3
          }) =>
        val c = cleanMedian(tc.map(_._1), tc.map(_._2), runBase).get
        val worstX = if (runBase > 0 && tc.nonEmpty) tc.map(_._2).max / runBase else 0.0
        val drainX = if (drainBase > 0 && drains.nonEmpty)
          f""","worst_rep_drain_x":${drains.max / drainBase}%.2f""" else ""
        "\"" + k + f"""\":{"median":${median(ts)}%.3f,"clean":$c%.3f,"worst_rep_canary_x":$worstX%.2f$drainX}"""
    }
    val flagged = flaggedAll.take(12).mkString("{", ",", "}")
    // no silent caps: the size budget keeps only 12 flagged rows in-line,
    // so say when there were more (the full set is in target/bench.json)
    val flaggedDropped = math.max(0, flaggedAll.size - 12)
    val slowest = medians.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val nErr = results.count(_._3.nonEmpty)
    val totalClean = results.collect { case (_, ts, _, _, tc, _, _) if ts.nonEmpty =>
      cleanMedian(tc.map(_._1), tc.map(_._2), runBase).get }.sum
    val compact =
      f"""{"metric":"total_runtime","value":$total%.3f,"unit":"sec","queries":$slowest,"queries_truncated_to_slowest":10,"sf":"$sfDir","n_queries":${medians.size},"n_errors":$nErr,"canary_median_s":$canaryMedian%.3f,"canary_min_s":$cMin%.3f,"canary_max_s":$cMax%.3f,"total_clean":$totalClean%.3f,"cpus":$cpus,"flagged":$flagged,"flagged_dropped":$flaggedDropped,"run_id":"$runId","detail":"per-query lines: target/bench.json; per-rep history: BENCHBOOK.jsonl"}"""
    println(compact)
    spark.stop()
  }
}
