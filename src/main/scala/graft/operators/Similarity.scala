package graft.operators

import graft.functions.Transforms
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  *   - Brute force: corpus ⨯ broadcast(queries) with the codegen'd cosine
  *     kernel — exact, O(N·Q·d), the verification baseline. At 100 TB the
  *     corpus never shuffles: queries broadcast, scoring is map-side, and
  *     per-query top-k reduces via partial aggregation.
  *   - IVF: k-means-style inverted file with deterministic seed centroids —
  *     each corpus vector is assigned to its nearest centroid once (narrow
  *     pass), queries probe only their own cell(s), cutting the scored
  *     candidates by ~numCells/probes. Centroid count scales with √N; the
  *     assignment is re-usable across query batches (write it as a column).
  */
object Similarity {

  /** Exact top-k neighbors for each query vector (excluding self-matches).
    * Scores rounded to 4dp; ties broken by corpus id for determinism.
    *
    * Reduction happens through [[graft.functions.TopKAgg]], a bounded typed
    * aggregator: partial aggregation collapses each map task's slice to k
    * rows per query BEFORE the exchange, so the shuffle carries Q×k rows —
    * a window-rank formulation would shuffle the entire Q×N score matrix
    * into Q skewed partitions.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, corpusId: String,
      queryId: String, vec: String, k: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("c_id"), col(vec).as("c_vec"))
    val q = queries.select(col(queryId).as("q_id"), col(vec).as("q_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(Transforms.vecCosine(col("c_vec"), col("q_vec")), 4).as("cosine"))
    topKPerKey(scored, "q_id", "cosine", "c_id", k)
  }

  /** [[bruteForceTopK]] over SQ8 codes ([[graft.functions.Sq8Ops]]): the
    * corpus side is scanned as 1-byte-per-dimension `binary` codes — 4× less
    * scan I/O and cache footprint than float vectors, the candidate-side
    * bandwidth lever at corpus scale. Scores are approximate (per-dimension
    * quantization error ~1/254) but fully deterministic, so this is
    * oracle-checkable end to end (`sim_topk_sq8`); same bounded TopKAgg
    * reduction, same (cosine desc, id) tie-break.
    */
  def bruteForceTopKSq8(corpus: DataFrame, queries: DataFrame, corpusId: String,
      queryId: String, vec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def code(c: org.apache.spark.sql.Column) =
      Transforms.sq8Encode(c.cast(ArrayType(FloatType)))
    val c = corpus.select(col(corpusId).as("c_id"), code(col(vec)).as("c_code"))
    val q = queries.select(col(queryId).as("q_id"), code(col(vec)).as("q_code"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(Transforms.sq8Cosine(col("c_code"), col("q_code")), 4).as("cosine"))
    topKPerKey(scored, "q_id", "cosine", "c_id", k)
  }

  /** Exact re-scoring of a candidate list — the second stage of
    * retrieve-then-rerank: `candidates` carries (q_id, c_id) pairs from ANY
    * cheap first rung (PQ-ADC, SQ8, an IVF probe), and only those pairs are
    * re-scored with the float-exact cosine and reduced to top-k (cosine
    * desc, id ties — the [[bruteForceTopK]] contract). The candidate list
    * is queries×C rows (broadcast-sized by the query-batch contract), so
    * the corpus-side work is a semi-join fetch of ≤ Q·C vectors — the
    * composition that makes PQ useful: a 64×-narrower code scan GENERATES
    * candidates, the exact rescore touches only the C survivors, and with
    * C a small corpus fraction recall recovers to near-exact
    * (`tools/AnnRecallProbe`'s rerank curve measures it). With `candidates`
    * = every (q, c) pair this IS brute force — the spec anchor.
    */
  def rerankExact(candidates: DataFrame, corpus: DataFrame, queries: DataFrame,
      corpusId: String, queryId: String, vec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val cv = corpus.select(col(corpusId).cast(LongType).as("c_id"), col(vec).as("c_vec"))
    val qv = queries.select(col(queryId).cast(LongType).as("q_id"), col(vec).as("q_vec"))
    val scored = cv
      .join(broadcast(candidates.select(col("q_id").cast(LongType).as("q_id"),
        col("c_id").cast(LongType).as("c_id"))), Seq("c_id"))
      .join(broadcast(qv), Seq("q_id"))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(Transforms.vecCosine(col("c_vec"), col("q_vec")), 4).as("cosine"))
    topKPerKey(scored, "q_id", "cosine", "c_id", k)
  }

  /** Group `df` by `key` and keep the top-k (score desc, id asc) rows via the
    * bounded partial aggregator; output matches the equivalent
    * `row_number().over(Window...)` filter exactly.
    */
  def topKPerKey(df: DataFrame, key: String, score: String, id: String, k: Int): DataFrame = {
    val agg = graft.functions.TopKAgg.topK(k)
    df.groupBy(col(key))
      .agg(agg(col(score), col(id)).as("tk"))
      .select(col(key), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col(key), (col("pos") + 1).cast("int").as("rank"),
        col("s.id").as(id), col("s.score").as(score))
  }

  /** Assign each vector to its nearest centroid (IVF cell). `centroids` must
    * be broadcastable (√N rows); determinism via (cosine desc, centroid id).
    *
    * Argmax via `max_by` over `struct(cosine, -cell)` rather than a window
    * rank: aggregation gets map-side partial combining, so the exchange
    * carries one row per corpus vector instead of numCentroids rows sorted —
    * the difference between shuffling N and 8N rows at corpus scale. The
    * struct ordering (cosine max, then -cell max = lowest cell id) matches
    * the window form `orderBy(cosine.desc, cell)` row 1 exactly.
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame, corpusId: String,
      centroidId: String, vec: String): DataFrame = {
    val c = centroids.select(col(centroidId).as("cell"), col(vec).as("cent_vec"))
    corpus.crossJoin(broadcast(c))
      .withColumn("cos6", round(Transforms.vecCosine(col(vec), col("cent_vec")), 6))
      .groupBy(col(corpusId))
      .agg(
        max_by(col("cell"), struct(col("cos6"), -col("cell"))).as("cell"),
        any_value(col(vec)).as(vec))
  }

  /** Lloyd's k-means for IVF centroids: seed with the first `numCells`
    * vectors (deterministic), then `iterations` rounds of
    * assign → element-wise mean. Each round is one broadcast-assign pass over
    * the corpus plus a (cell, dim)-keyed average — both partial-aggregating,
    * so training cost is `iterations` linear scans regardless of cluster
    * count. Returns (cell id, centroid vector) with unit-normalized means
    * (cosine IVF wants spherical k-means).
    *
    * Each round's result is materialized on the driver (`collect` of
    * numCells ≈ √N rows — bounded by the same contract that makes centroids
    * broadcastable in [[assignCells]]): without it, round r's lazy plan
    * re-derives every earlier round from the corpus scan (O(iterations²)
    * scans), and downstream consumers like [[ivfTopK]] — which reference the
    * centroids twice — would recompute the entire training. Same pattern as
    * Spark MLlib's KMeans, which collects centroids per iteration.
    */
  def trainCentroids(corpus: DataFrame, corpusId: String, vec: String,
      numCells: Int, iterations: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    def localize(df: DataFrame): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(df.collect().toIndexedSeq, 1), df.schema)
    var centroids = localize(corpus
      .orderBy(col(corpusId)).limit(numCells)
      .select(col(corpusId).cast("int").as("cell_id"), col(vec).as("centroid")))
    var it = 0
    while (it < iterations) {
      val centAsVec = centroids.select(col("cell_id"), col("centroid").as(vec))
      val assigned = assignCells(corpus, centAsVec, corpusId, "cell_id", vec)
        .select(col("cell"), posexplode(col(vec)).as(Seq("pos", "x")))
      val means = assigned.groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("cell_id"),
          transform(col("pm"), e => e.getField("m").cast("float")).as("centroid"))
      // unit-normalize (spherical); empty cells simply drop out. Norm is
      // computed ONCE per centroid — inside the transform lambda it would
      // re-scan the whole array per element (O(d^2))
      centroids = localize(means
        .withColumn("nrm", greatest(Transforms.vecNorm(col("centroid")), lit(1e-12)))
        .select(col("cell_id"),
          transform(col("centroid"), x => (x / col("nrm")).cast("float")).as("centroid")))
      it += 1
    }
    centroids
  }

  /** IVF top-k: probe only the query's own cell. Recall < 1 by construction;
    * verify against bruteForceTopK on a sample when tuning cell counts.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      corpusId: String, queryId: String, centroidId: String, vec: String, k: Int): DataFrame = {
    val corpusCells = assignCells(corpus, centroids, corpusId, centroidId, vec)
      .select(col(corpusId).as("c_id"), col(vec).as("c_vec"), col("cell"))
    val queryCells = assignCells(queries, centroids, queryId, centroidId, vec)
      .select(col(queryId).as("q_id"), col(vec).as("q_vec"), col("cell"))
    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(Transforms.vecCosine(col("c_vec"), col("q_vec")), 4).as("cosine"))
    topKPerKey(scored, "q_id", "cosine", "c_id", k)
  }

  /** Multi-probe query fan-out: each query's `nProbe` nearest centroids, as
    * (query id, rank, cell, cos6) rows. The standard IVF recall knob —
    * probing more cells scores more candidates. Rank-1 matches
    * [[assignCells]]' argmax exactly (same score-desc, cell-asc tie-break
    * through the bounded [[graft.functions.TopKAgg]]).
    */
  def assignCellsProbes(queries: DataFrame, centroids: DataFrame, queryId: String,
      centroidId: String, vec: String, nProbe: Int): DataFrame = {
    val c = centroids.select(col(centroidId).as("cell"), col(vec).as("cent_vec"))
    val scored = queries.crossJoin(broadcast(c))
      .select(col(queryId), col("cell"),
        round(Transforms.vecCosine(col(vec), col("cent_vec")), 6).as("cos6"))
    topKPerKey(scored, queryId, "cos6", "cell", nProbe)
  }

  /** IVF top-k with multi-probe: candidates come from each query's `nProbe`
    * nearest cells. `nProbe = 1` equals [[ivfTopK]]; `nProbe = numCells`
    * degenerates to [[bruteForceTopK]] EXACTLY (every corpus vector becomes
    * a candidate — the spec-level exactness anchor), and recall@k is
    * monotone in `nProbe` because a corpus vector lives in exactly one cell,
    * so the candidate set only grows. `tools/AnnRecallProbe` measures the
    * recall/candidate trade across the sweep.
    */
  def ivfTopKProbes(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      corpusId: String, queryId: String, centroidId: String, vec: String,
      k: Int, nProbe: Int): DataFrame = {
    val corpusCells = assignCells(corpus, centroids, corpusId, centroidId, vec)
      .select(col(corpusId).as("c_id"), col(vec).as("c_vec"), col("cell"))
    val queryCells = assignCellsProbes(queries, centroids, queryId, centroidId, vec, nProbe)
      .select(col(queryId).as("q_id"), col("cell"))
      .join(queries.select(col(queryId).as("q_id"), col(vec).as("q_vec")), Seq("q_id"))
    // no distinct needed on (q, c): a corpus vector is assigned to exactly
    // one cell, so a pair can only arise from one probed cell
    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(Transforms.vecCosine(col("c_vec"), col("q_vec")), 4).as("cosine"))
    topKPerKey(scored, "q_id", "cosine", "c_id", k)
  }
}
