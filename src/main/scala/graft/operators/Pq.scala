package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

/** Product quantization for ANN scoring (the public concept — Jégou et al.
  * 2011, "Product Quantization for Nearest Neighbor Search": split each
  * vector into `m` subspaces, quantize each subvector against a per-subspace
  * codebook of `k` codewords, and score candidates from the codes alone via
  * asymmetric distance computation). The compression rung past SQ8: a 64-dim
  * float vector (256 B) becomes `m` codeword ids (4 B at m=4) — the
  * candidate side of a scan shrinks ~64×, at the price of a coarser
  * approximation than SQ8's ~1/254-per-dim error.
  *
  * ADC, cosine form: the candidate is reconstructed IMPLICITLY —
  * `dot(q, x̂) = Σ_j dot(q_j, cw(j, code_j))` and `‖x̂‖² = Σ_j ‖cw‖²` are
  * looked up from a per-query table (LUT) of `m·k` precomputed partials, so
  * scoring a candidate costs `m` lookups, never a 64-dim loop. In DataFrame
  * terms the LUT is queries × codebook (broadcast — `q·m·k` rows), codes
  * stay EXPLODED as `(id, sub, cw)` (their narrowest join shape), and the
  * per-candidate sum is a partial-agged groupBy.
  *
  * Everything is deterministic and SQL-replayable (the `sim_topk_pq`
  * oracle): codebooks are caller-provided (the driver seeds them with the
  * first `k` corpus vectors' subvectors, the `sim_ivf` seed convention),
  * encode argmin rounds the squared L2 to 6dp before the (dist asc, cw asc)
  * tie-break — the [[Similarity.assignCells]] quantization discipline — and
  * all element math runs on exact float→double widenings with the SAME
  * formula shape on both engines.
  *
  * Exactness anchor (TrainingOpsSpec): when the corpus IS the seed set,
  * every subvector is its own codeword, reconstruction is lossless, and
  * PQ-ADC top-k ≡ brute-force float top-k at 4dp.
  */
object Pq {

  private def dbl(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Index-ordered Σ a_i·b_i over double arrays (builtin fold — PQ vectors
    * are subspace-sized, so the custom float kernels buy nothing here and
    * the builtin keeps the formula identical to the oracle's SQL).
    * `private[operators]`: [[PersistedIvf]]'s residual-ADC terms (query ×
    * centroid, centroid × codeword) must use the SAME formula shape.
    */
  private[operators] def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, x) => acc + x)

  private def d2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0d), (acc, x) => acc + x)

  /** Per-subspace codebook from seed vectors: `(sub, cw, cvec)` — subspace
    * `j` of seed `id` contributes codeword `cw = id` with vector
    * `cvec = vec[j·subDim+1 .. (j+1)·subDim]`. Deterministic given the
    * seeds; `k` codewords per subspace = number of seed rows.
    */
  def codebook(seeds: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame =
    seeds.select(col(idCol).cast(LongType).as("cw"), dbl(col(vecCol)).as("v"))
      .select(col("cw"), explode(sequence(lit(0), lit(m - 1))).as("sub"), col("v"))
      .select(col("sub").cast(IntegerType).as("sub"), col("cw"),
        slice(col("v"), col("sub") * subDim + 1, lit(subDim)).as("cvec"))

  /** Codebook TRAINED per subspace — plain (non-spherical) Lloyd's on the
    * subvector slices, the production PQ codebook the seed-slice
    * [[codebook]] approximates: codeword vectors converge to subspace
    * cluster MEANS, magnitudes preserved (reconstruction needs them — the
    * spherical [[Similarity.trainCentroids]] would normalize them away).
    * Initialized from the first `k` corpus rows' slices (deterministic
    * seeds, the `sim_ivf` convention); empty clusters drop out. Codebook
    * quality is what recall rides on — `tools/AnnRecallProbe`'s rung table
    * measures seed-slice vs trained on the real embeddings.
    */
  def trainedCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, subDim: Int = 16, k: Int = 64, iterations: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    // collect per round: k·m tiny rows — without it round r's lazy plan
    // re-derives every earlier round (the trainCentroids argument)
    def localize(df: DataFrame): DataFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(df.collect().toIndexedSeq, 1), df.schema)
    val sv = corpus.select(col(idCol).cast(LongType).as("id"), dbl(col(vecCol)).as("v"))
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("s"), col("v"))
      .select(col("id"), col("s").cast(IntegerType).as("sub"),
        slice(col("v"), col("s") * subDim + 1, lit(subDim)).as("sv"))
    var cb = localize(codebook(corpus.orderBy(col(idCol)).limit(k), idCol, vecCol, m, subDim))
    var it = 0
    while (it < iterations) {
      cb = localize(encode(corpus, idCol, vecCol, cb, m, subDim)
        .join(sv, Seq("id", "sub"))
        .select(col("sub"), col("cw"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cw"), col("pos")).agg(avg(col("x")).as("mc"))
        .groupBy(col("sub"), col("cw"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mc")))).as("pm"))
        .select(col("sub"), col("cw"),
          transform(col("pm"), e => e.getField("mc")).as("cvec")))
      it += 1
    }
    cb
  }

  /** Encode: nearest codeword per (vector, subspace) — squared-L2 argmin at
    * 6dp, ties to the lowest codeword id. Output `(id, sub, cw)`, the
    * narrow candidate-side shape scoring joins on.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      cb: DataFrame, m: Int, subDim: Int): DataFrame =
    corpus.select(col(idCol).cast(LongType).as("id"), dbl(col(vecCol)).as("v"))
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("s"), col("v"))
      .select(col("id"), col("s").cast(IntegerType).as("sub"),
        slice(col("v"), col("s") * subDim + 1, lit(subDim)).as("sv"))
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d6", round(d2(col("sv"), col("cvec")), 6))
      .groupBy(col("id"), col("sub"))
      .agg(max_by(col("cw"), struct(-col("d6"), -col("cw"))).as("cw"))

  /** Per-query ADC lookup table `(q_id, sub, cw, dotp, n2p, qn)`: the
    * queries × codebook partial dot products and codeword norms (m·k rows
    * per query — broadcast-sized by the query-batch contract) every ADC
    * scorer joins codes against.
    */
  def lut(queries: DataFrame, queryId: String, vecCol: String,
      cb: DataFrame, m: Int, subDim: Int): DataFrame =
    queries.select(col(queryId).cast(LongType).as("q_id"), dbl(col(vecCol)).as("qv"))
      .select(col("q_id"), explode(sequence(lit(0), lit(m - 1))).as("s"), col("qv"),
        sqrt(dotD(col("qv"), col("qv"))).as("qn"))
      .select(col("q_id"), col("s").cast(IntegerType).as("sub"),
        slice(col("qv"), col("s") * subDim + 1, lit(subDim)).as("qsv"), col("qn"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("q_id"), col("sub"), col("cw"),
        dotD(col("qsv"), col("cvec")).as("dotp"),
        dotD(col("cvec"), col("cvec")).as("n2p"), col("qn"))

  /** The ADC reduction: LUT-joined code rows (`q_id, id, dotp, n2p, qn`,
    * m per pair) → `(q_id, c_id, cosine)` at 4dp. Partial sums are exact
    * (each pair contributes exactly its m LUT partials), so the groupBy is
    * map-side combined and order-safe.
    */
  private[operators] def adcReduce(joined: DataFrame): DataFrame =
    joined.groupBy(col("q_id"), col("id"))
      .agg(sum(col("dotp")).as("dot"), sum(col("n2p")).as("n2"),
        any_value(col("qn")).as("qn"))
      .select(col("q_id"), col("id").as("c_id"),
        round(when(col("qn") === 0 || col("n2") === 0, lit(0d))
          .otherwise(col("dot") / (col("qn") * sqrt(col("n2")))), 4).as("cosine"))

  /** ADC top-k: score every corpus code against every query via the
    * broadcast LUT (see class doc), bounded TopKAgg reduction, (cosine
    * desc, id) ties — the [[Similarity.bruteForceTopK]] contract on codes.
    */
  def topK(corpus: DataFrame, queries: DataFrame, corpusId: String,
      queryId: String, vecCol: String, k: Int, seeds: DataFrame,
      seedId: String, m: Int = 4, subDim: Int = 16): DataFrame =
    topKWith(corpus, queries, corpusId, queryId, vecCol, k,
      codebook(seeds, seedId, vecCol, m, subDim), m, subDim)

  /** [[topK]] against a caller-provided codebook (e.g. [[trainedCodebook]]). */
  def topKWith(corpus: DataFrame, queries: DataFrame, corpusId: String,
      queryId: String, vecCol: String, k: Int, cb: DataFrame,
      m: Int = 4, subDim: Int = 16): DataFrame = {
    val codes = encode(corpus, corpusId, vecCol, cb, m, subDim)
    val l = lut(queries, queryId, vecCol, cb, m, subDim)
    val scored = adcReduce(codes.join(broadcast(l), Seq("sub", "cw"))
      .filter(col("id") =!= col("q_id")))
    Similarity.topKPerKey(scored, "q_id", "cosine", "c_id", k)
  }
}
