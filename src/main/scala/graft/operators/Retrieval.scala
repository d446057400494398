package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Full-text retrieval over the documents corpus — the keyword complement to
  * the embedding-space [[Similarity]] family (a training-data pipeline needs
  * both: BM25 for lexical recall/decontamination lookups, ANN for semantic).
  *
  * [[bm25]] is the public Okapi BM25 ranking function (Robertson & Walker,
  * SIGIR 1994; the `k1`/`b` saturation form every search engine documents):
  * `score(q,d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
  * with `idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)` (the Lucene variant —
  * never negative).
  *
  * 100 TB shape — nothing corpus-sized shuffles except matched postings:
  *   - `N`/`avgdl` are ONE map-side-combined aggregate collapsed to driver
  *     scalars (the [[Corpus.tfidf]] discipline);
  *   - query terms (a query BATCH is human-sized) broadcast, so the corpus
  *     side is tokenize → broadcast semi-join: only rows whose token matches
  *     some query term survive to the `(doc, term)` groupBy — the shuffle
  *     carries matched postings, not the corpus;
  *   - `df` derives from that same tf frame (no second tokenization), is
  *     query-term-bounded, and broadcasts back;
  *   - the final per-(query, doc) reduction is [[Similarity.topKPerKey]]'s
  *     bounded [[graft.functions.TopKAgg]] — map-side top-k, the exchange
  *     carries queries×k rows, never the score matrix.
  *
  * Determinism across engines (the `doc_bm25` oracle replays all of this in
  * SQL): per-(query, term, doc) contributions are QUANTIZED to integer
  * micro-units — `floor(1e6 · idf · sat)` — and summed as longs, so the
  * cross-partition addition order that makes a double `sum()`
  * nondeterministic cannot move the result (the [[Corpus.lmScore]]
  * micro-nat discipline); the final score is the exact integer sum / 1e6
  * rounded to 4dp. Query terms are deduplicated (set-of-terms semantics —
  * the common simplification; term multiplicity in a query is a weighting
  * refinement BM25's qtf extension covers, not implemented here).
  * Tokenization is the corpus-wide whitespace convention
  * ([[TextOps.tokens]]), restated in SQL as
  * `list_filter(string_split(text, ' '), x -> x <> '')`.
  */
object Retrieval {

  /** Top-`k` documents per query by BM25. `docs` = (idCol, textCol, …),
    * `queries` = (qIdCol, qTextCol) with long-castable ids. Output:
    * `(q_id, rank, doc id, bm25)` — rank 1-based, (score desc, id asc) ties,
    * documents matching zero query terms absent (score 0 by definition).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (n, sumdl) = corpusStats(docs, textCol)
    require(n > 0, "bm25 needs a non-empty corpus")
    // exact IEEE division of two integer-valued doubles — bit-identical to
    // the oracle's CAST(sum AS DOUBLE)/n, so injecting it as a literal is safe
    val avgdl = sumdl.toDouble / n

    val qterms = queryTerms(queries, qIdCol, qTextCol)
    val terms = qterms.select(col("t")).distinct()

    val tf = docs.select(col(idCol).cast(LongType).as("id"),
        TextOps.tokenCountWs(col(textCol)).cast("double").as("dl"),
        explode(TextOps.tokens(col(textCol))).as("t"))
      .join(broadcast(terms), Seq("t"))
      .groupBy(col("id"), col("t"))
      .agg(count(lit(1)).cast("double").as("tf"), any_value(col("dl")).as("dl"))
    scoreMatched(tf, qterms, n, avgdl, k1, b, k)
  }

  /** `(N, Σ dl)` of a corpus — ONE map-side-combined aggregate. Documents
    * with empty (or null) text count toward `N`; null text contributes
    * nothing to `Σ dl` (sum skips nulls — the oracle's semantics).
    */
  private[operators] def corpusStats(docs: DataFrame, textCol: String): (Long, Long) = {
    val r = docs.agg(
      count(lit(1)).as("n"),
      sum(TextOps.tokenCountWs(col(textCol)).cast(LongType)).as("sumdl")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Deduplicated `(q_id, t)` query terms (set-of-terms semantics). */
  private[operators] def queryTerms(queries: DataFrame, qIdCol: String,
      qTextCol: String): DataFrame =
    queries.select(col(qIdCol).cast(LongType).as("q_id"),
        explode(TextOps.tokens(col(qTextCol))).as("t"))
      .distinct()

  /** Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009 —
    * the standard hybrid-retrieval combiner): `fused(q, d) = Σ_r 1 / (kRrf
    * + rank_r(q, d))` over the rankings that contain `d`, `kRrf = 60` per
    * the paper. Rank-based, so a lexical leg ([[bm25]]) and a semantic leg
    * ([[Similarity.bruteForceTopK]] and friends) fuse without score
    * calibration — exactly the lexical+ANN hybrid a curation pipeline runs.
    *
    * Each ranking is `(q_id, id, rank)` with rank 1-based. Inputs are
    * top-k-bounded rank lists (queries × k rows — driver-small by
    * construction), so the fusion itself costs one bounded union + groupBy:
    * the heavy lifting stays in the legs, which keep their own 100 TB
    * shapes. Determinism: each contribution is the exact integer
    * `1e9 div (kRrf + rank)` — integer division, so no engine can round
    * differently and long addition commutes; ranking is by the exact sum
    * ((sum desc, id) ties), the displayed score is sum/1e9 at 6dp.
    */
  def rrf(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    val contrib = rankings.map(_.select(col("q_id").cast(LongType).as("q_id"),
        col("id").cast(LongType).as("id"),
        expr(s"CAST(1000000000 AS BIGINT) div " +
          s"(CAST($kRrf AS BIGINT) + CAST(rank AS BIGINT))").as("c")))
      .reduce(_ union _)
    val scored = contrib.groupBy(col("q_id"), col("id"))
      .agg(sum(col("c")).as("s"))
      // the long sum is < 2^53 (≤ rankings × 1e9/61 per doc) — exact as the
      // double TopKAgg ranks on
      .select(col("q_id"), col("id"), col("s").cast("double").as("rrf_s"))
    Similarity.topKPerKey(scored, "q_id", "rrf_s", "id", k)
      .select(col("q_id"), col("rank"), col("id"),
        round(col("rrf_s") / 1e9, 6).as("rrf"))
  }

  /** WEIGHTED Reciprocal Rank Fusion with per-leg depth cuts — the [[rrf]]
    * extension a hybrid query needs the moment its legs differ in quality:
    * `fused(q, d) = Σ_r w_r / (kRrf + rank_r(q, d))`, the weighted variant
    * Cormack et al. note and every production hybrid search exposes.
    * `weight` is PER-MILLE (1000 = 1.0 — the unweighted contribution), so
    * contributions stay exact integers: `w · (1e9 div (kRrf + rank))`
    * summed as longs (≤ legs · 1000 · 1.7e7 ≪ 2^53), addition-order-proof
    * like everything else in this file; the displayed score is the exact
    * sum / 1e12 at 6dp, which for all-1000 weights equals [[rrf]]'s
    * display digit for digit. `topN` cuts a leg to its first n ranks
    * BEFORE fusion — deep tail ranks from a weak leg otherwise leak rank
    * juice into documents the strong leg never surfaced.
    */
  def rrfWeighted(legs: Seq[Retrieval.RrfLeg], k: Int, kRrf: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfWeighted needs at least one leg")
    legs.foreach(l => require(l.weight > 0, s"leg weight ${l.weight} must be positive"))
    val contrib = legs.map { l =>
      val cut = l.topN.map(n => l.ranking.filter(col("rank") <= n)).getOrElse(l.ranking)
      cut.select(col("q_id").cast(LongType).as("q_id"),
        col("id").cast(LongType).as("id"),
        expr(s"CAST(${l.weight} AS BIGINT) * (CAST(1000000000 AS BIGINT) div " +
          s"(CAST($kRrf AS BIGINT) + CAST(rank AS BIGINT)))").as("c"))
    }.reduce(_ union _)
    val scored = contrib.groupBy(col("q_id"), col("id"))
      .agg(sum(col("c")).as("s"))
      .select(col("q_id"), col("id"), col("s").cast("double").as("rrf_s"))
    Similarity.topKPerKey(scored, "q_id", "rrf_s", "id", k)
      .select(col("q_id"), col("rank"), col("id"),
        round(col("rrf_s") / 1e12, 6).as("rrf"))
  }

  /** One [[rrfWeighted]] leg: a `(q_id, id, rank)` ranking, its per-mille
    * weight (1000 = 1.0), and an optional depth cut applied before fusion.
    */
  final case class RrfLeg(ranking: DataFrame, weight: Int = 1000,
      topN: Option[Int] = None)

  /** The BM25 reduction shared by the inline path and the persisted-index
    * path ([[PersistedPostings.query]]): `tf` = the query-term-matched
    * postings `(id, t, tf, dl)` — tf/dl as doubles — `qterms` = `(q_id, t)`.
    * `df` derives from `tf` itself (exact: a matched term's postings are
    * complete in both producers), is query-term-bounded, and broadcasts
    * back. Quantized micro-unit scoring per the class doc.
    */
  private[operators] def scoreMatched(tf: DataFrame, qterms: DataFrame,
      n: Long, avgdl: Double, k1: Double, b: Double, k: Int): DataFrame = {
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    // idf · saturation, quantized (class doc). Operation ORDER mirrors the
    // oracle SQL exactly — ln/div/mul are not associative-safe to rearrange.
    val idf = log((lit(n.toDouble) - col("df") + 0.5d) / (col("df") + 0.5d) + 1.0d)
    val sat = (col("tf") * (k1 + 1.0d)) /
      (col("tf") + lit(k1) * (lit(1.0d - b) + lit(b) * col("dl") / avgdl))
    val scored = tf.join(broadcast(dfreq), Seq("t"))
      .join(broadcast(qterms), Seq("t"))
      .withColumn("c_micro", floor(lit(1e6) * idf * sat).cast(LongType))
      .groupBy(col("q_id"), col("id"))
      .agg(sum(col("c_micro")).as("s_micro"))
      .select(col("q_id"), col("id"),
        round(col("s_micro").cast("double") / 1e6, 4).as("bm25"))
    Similarity.topKPerKey(scored, "q_id", "bm25", "id", k)
  }
}
