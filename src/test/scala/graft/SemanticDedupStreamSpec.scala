package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.operators.Dedup
import graft.sources.AtomicWarehouse
import graft.streaming.SemanticDedupStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The semantic-dedup stream's contracts: id-ordered micro-batches reproduce
  * batch [[Dedup.semanticDedup]] bit-identically (arrival retention + the
  * first-arrival rule collapsing to lower-id-wins), replays are ledgered
  * no-ops, and out-of-order arrival honors FIRST-ARRIVAL-WINS — an admitted
  * survivor repels a later near-duplicate even when the later one has the
  * smaller id. The `dedup_semantic_stream` driver oracle restates the
  * id-ordered case in SQL; these cases pin the mechanisms and the
  * out-of-order semantics the oracle cannot reach.
  */
class SemanticDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id".cast("long").as("vec_id"),
      $"embedding".cast("array<float>").as("embedding"))

  private def seeds = emb.filter($"vec_id" < 8)
    .select($"vec_id".as("cell"), $"embedding".as("centroid"))

  private def writeChunks(inDir: String, parts: Seq[DataFrame]): Unit =
    parts.zipWithIndex.foreach { case (p, i) =>
      val tmp = Files.createTempDirectory(s"graft-sems-c$i-").toString + "/out"
      p.coalesce(1).write.parquet(tmp)
      val part = graft.LocalFs.onlyParquet(tmp)
      Files.move(part, Paths.get(inDir, f"chunk_$i%02d.parquet"), StandardCopyOption.ATOMIC_MOVE)
    }

  private def freshStream(minCosine: Double): SemanticDedupStream = {
    val whDir = Files.createTempDirectory("graft-sems-wh-").toString
    val sd = new SemanticDedupStream(new AtomicWarehouse(spark, whDir), minCosine)
    sd.init(seeds)
    sd
  }

  private def survivorSet(sd: SemanticDedupStream): Set[(Long, Int)] =
    sd.survivors().collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  test("id-ordered micro-batches reproduce batch semanticDedup exactly") {
    val inDir = Files.createTempDirectory("graft-sems-in-").toString
    val ckpt = Files.createTempDirectory("graft-sems-ck-").toString
    writeChunks(inDir, (0 until 3).map(i =>
      emb.filter($"vec_id" >= i * 167 && $"vec_id" < (i + 1) * 167)))
    val sd = freshStream(0.45)
    val q = sd.start(inDir, ckpt, Trigger.AvailableNow())
    assert(q.awaitTermination(300000), "stream failed to drain within 300 s")

    val batch = Dedup.semanticDedup(emb, "vec_id", "embedding", seeds, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt)).toSet
    val got = survivorSet(sd)
    assert(got == batch, s"streamed ${got.size} survivors vs batch ${batch.size}")
    // arrival retention: the index holds EVERY vector, admitted or not
    assert(sd.index().count() == emb.count())
  }

  test("mid-stream drift retrain: survivor ids preserved, future batches dedup under the new geometry") {
    val sd = freshStream(0.45)
    sd.processBatch(emb.filter($"vec_id" < 200), 0L)
    val idsBefore = sd.survivors().collect().map(_.getLong(0)).toSet
    // the first batch set the drift baseline
    assert(sd.assignStats().filter(col("kind") === "train").count() == 1)
    assert(!sd.drifted())
    sd.retrain(numCells = 8, iterations = 2)
    // the survivor ID set is untouched; cells re-labeled consistently with
    // the re-assigned index
    val after = sd.survivors().collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(after.keySet == idsBefore, "retrain must not change the survivor id set")
    val idxCells = sd.index().collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(after.forall { case (id, c) => idxCells(id) == c },
      "survivor cells must match the re-assigned index")
    // the drift baseline reset to the new geometry
    val st = sd.assignStats().collect()
    assert(st.length == 1 && st.head.getString(1) == "train" && st.head.getLong(0) == -1L)
    assert(!sd.drifted())
    // a later batch of EXACT duplicates of arrived vectors must fully drop
    // under the new geometry (same vector → same new cell → cos 1 match)
    val dup = emb.filter($"vec_id" < 50)
      .select(($"vec_id" + 10000).cast("long").as("vec_id"), $"embedding")
    sd.processBatch(dup, 1L)
    val ids2 = sd.survivors().collect().map(_.getLong(0)).toSet
    assert(ids2 == idsBefore,
      s"exact duplicates after retrain must all drop (extra: ${ids2 -- idsBefore})")
    // and the batch recorded its drift row against the new baseline
    assert(sd.assignStats().filter(col("kind") === "batch").count() == 1)
  }

  test("checkpoint replay of a committed batch is a ledgered no-op") {
    val sd = freshStream(0.45)
    val b0 = emb.filter($"vec_id" < 100)
    sd.processBatch(b0, batchId = 0L)
    val (surv, idx) = (survivorSet(sd), sd.index().count())
    sd.processBatch(b0, batchId = 0L)
    assert(survivorSet(sd) == surv, "replay changed the survivor set")
    assert(sd.index().count() == idx, "replay duplicated index rows")
  }

  test("out-of-order arrival: first admitted wins, regardless of id") {
    // two near-identical vectors; the HIGHER id arrives first
    def one(id: Long, v: Seq[Float]): DataFrame =
      Seq((id, v)).toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val v = Seq.fill(4)(0.5f)
    val sd = {
      val whDir = Files.createTempDirectory("graft-sems-wh-").toString
      val s = new SemanticDedupStream(new AtomicWarehouse(spark, whDir), 0.999,
        idCol = "vec_id", vecCol = "embedding")
      s.init(one(0L, v).select($"vec_id".as("cell"), $"embedding".as("centroid")))
      s
    }
    sd.processBatch(one(50L, v), batchId = 0L)
    sd.processBatch(one(10L, v), batchId = 1L)
    assert(survivorSet(sd).map(_._1) == Set(50L),
      "the first-arrived survivor must repel the later lower-id near-dup")
  }
}
