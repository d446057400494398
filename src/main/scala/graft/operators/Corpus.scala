package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-LEVEL statistics and curation operators — the aggregating
  * complement to the per-row [[TextOps]] primitives. Everything here
  * shuffles, so every operator states its shuffle key and why that key
  * stays uniform at 100 TB:
  *
  *   - [[topTokens]]/[[tfidf]] shuffle on `token` — a power-law key space,
  *     but partial (map-side) aggregation collapses each partition's
  *     duplicates first, so the shuffle carries one row per (partition,
  *     token), not one per occurrence; the hot-token skew never leaves the
  *     mappers.
  *   - [[contaminated]] shuffles nothing on the big side: the eval set's
  *     n-gram hashes broadcast (eval benchmarks are ~10⁴–10⁶ grams), and
  *     the train side is a narrow scan + broadcast semi-join.
  *   - [[packShards]] shuffles on the pack key (e.g. language) — its window
  *     is a running cumulative sum, evaluated incrementally per partition.
  *
  * Reference scope: the reference engine has no corpus analytics; these
  * extend the engine for LLM training-data pipelines (SURVEY §2 addendum),
  * keyed to the same documents schema the dedup family uses.
  */
object Corpus {

  /** CCNet-style LM familiarity scoring (the public concept — Wenzek et al.
    * 2019, arXiv:1911.00359: score documents by their likelihood under a
    * language model fit to a reference corpus; high negative-log-likelihood
    * = out-of-distribution = filter candidate). Here the LM is an add-one-
    * smoothed UNIGRAM model over whitespace tokens of `train`:
    * `p(tok) = (c+1)/(N+V+1)` with `c` the train count (0 for OOV), `N`
    * train token occurrences, `V` train vocabulary size. Output per scored
    * document: `(idCol, n_tokens, n_oov, nll)` — `nll` the mean negative
    * log-likelihood in nats (4dp), null for token-less docs.
    *
    * 100 TB shape: exactly CCNet's — the LM is vocabulary-sized and
    * BROADCAST; scoring is one tokenization + explode + broadcast left join
    * + per-doc aggregate. The train side is one partial-agged token count.
    * Nothing shuffles on the corpus side except the per-doc groupBy.
    *
    * Determinism across engines (the `doc_lm_score` oracle replays this in
    * SQL): `ln` is not guaranteed correctly-rounded, so per-token log-probs
    * are QUANTIZED to integer micro-nats — `floor(1e6·ln(c+1))` over the
    * small set of distinct integer counts — and summed exactly;
    * `-ln p = lpD - lp(c)` with `lpD = floor(1e6·ln(N+V+1))` covers OOV
    * (c=0 → lp=0 → cost lpD) through the same formula. The only floating
    * division is the final mean, rounded to 4dp like every score in this
    * engine.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      train: DataFrame, trainTextCol: String): DataFrame = {
    def toks(df: DataFrame, c: String) = df.filter(col(c).isNotNull)
      .select(df.columns.map(col) :+ explode(split(col(c), "\\s+")).as("tok"): _*)
    val counts = toks(train.select(col(trainTextCol)), trainTextCol)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val nv = counts.agg(sum(col("c")), count(lit(1))).head()
    val d = nv.getLong(0) + nv.getLong(1) + 1L
    val lpD = math.floor(1e6 * math.log(d.toDouble)).toLong
    val scored = toks(docs.select(col(idCol), col(textCol)), textCol)
      .join(broadcast(counts), Seq("tok"), "left")
      .select(col(idCol), coalesce(col("c"), lit(0L)).as("c"))
    val agg = scored.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("c") === 0, 1L).otherwise(0L)).as("n_oov"),
      sum(lit(lpD) - floor(lit(1e6) * log(col("c") + 1)).cast(LongType)).as("s_micro"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(col("n_tokens") > 0,
          round(col("s_micro").cast("double") / col("n_tokens") / lit(1e6), 4))
          .as("nll"))
  }

  /** Global top-`k` tokens by occurrence count, tie-broken deterministically
    * (count desc, then token asc). Physical shape: explode → hash aggregate
    * with map-side combine → `TakeOrderedAndProject` (each partition keeps
    * only its local top-k; the driver merges k-sized heaps, never the full
    * vocabulary).
    */
  def topTokens(docs: DataFrame, text: String, k: Int): DataFrame =
    docs.select(explode(TextOps.tokens(col(text))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)

  /** Bounded-state Misra-Gries summary: at most `2×cap` live counters.
    * `shrink` subtracts the (cap+1)-th largest count from every counter and
    * drops the non-positive — the classic MG step, batched so inserts stay
    * O(1) amortized. `decremented` accumulates the total subtracted: any
    * token's TRUE count exceeds its counter by at most `decremented`, and a
    * token absent from the summary has true count ≤ `decremented` — the
    * bound that makes the candidate set provably complete.
    */
  final class MgSummary(cap: Int) extends Serializable {
    val counters = new java.util.HashMap[String, Long]()
    var decremented = 0L
    def add(t: String): Unit = {
      counters.merge(t, 1L, (a, b) => a + b)
      if (counters.size > cap * 2) shrink()
    }
    private def shrink(): Unit = {
      val vals = new Array[Long](counters.size)
      var i = 0
      val it0 = counters.values().iterator()
      while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val thr = vals(vals.length - 1 - cap) // (cap+1)-th largest
      val it = counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= thr) it.remove() else e.setValue(e.getValue - thr)
      }
      decremented += thr
    }
    def merge(o: MgSummary): MgSummary = {
      o.counters.forEach((k, v) => counters.merge(k, v, (a, b) => a + b))
      decremented += o.decremented
      if (counters.size > cap * 2) shrink()
      this
    }
  }

  /** [[topTokens]]'s 100 TB shape: heavy hitters with BOUNDED state. The
    * exact path's hash aggregate keys on the whole vocabulary — fine at
    * millions of tokens, not at a web corpus's billions. Here each
    * partition keeps a [[MgSummary]] of ≤ 2×`capacity` counters,
    * summaries tree-merge (error bounds ADD, staying ≤ n/capacity), and
    * the surviving candidate set — provably a superset of every token
    * with true count > `decremented` — is recounted EXACTLY in one
    * hash-set-filtered pass, so the output is identical to [[topTokens]],
    * not an estimate. Fails loudly if the guarantee cannot certify the
    * k-th result (count ≤ the error bound — capacity too small for the
    * distribution) rather than returning a silently unverified list.
    */
  def topTokensSketch(docs: DataFrame, text: String, k: Int,
      capacity: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def toks = docs.select(explode(TextOps.tokens(col(text))).as("token"))
    val summary = toks.as[String].rdd.treeAggregate(new MgSummary(capacity))(
      (s, t) => { s.add(t); s }, (a, b) => a.merge(b))
    val candidates = new Array[String](summary.counters.size)
    summary.counters.keySet().toArray(candidates)
    val rows = toks.filter(col("token").isInCollection(candidates.toSeq))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)
      .collect()
    val kth = rows.lastOption.map(_.getLong(1)).getOrElse(0L)
    // decremented == 0 ⇒ the summary never shrank: it IS the exact
    // vocabulary (small corpora, few distincts). Otherwise the k-th
    // result's exact count must clear the error bound — an absent token's
    // true count is ≤ decremented, so nothing outside the candidate set
    // can outrank it.
    val certified = summary.decremented == 0L ||
      (rows.length >= k && kth > summary.decremented)
    if (!certified)
      sys.error(s"topTokensSketch cannot certify top-$k: the $k-th count " +
        s"$kth is within the MG error bound ${summary.decremented} — " +
        "raise capacity")
    spark.createDataFrame(java.util.Arrays.asList(rows.toSeq: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cnt", LongType))))
  }

  /** Per-(document, token) TF-IDF: `tf * ln(N / df)` with `tf` = in-doc
    * occurrences, `df` = documents containing the token, `N` = corpus size.
    * The two aggregations reuse ONE tokenization: `df` is derived from the
    * (doc, token) term-frequency frame (`count per token` over it ≡ distinct
    * docs containing the token — no second scan, no count-distinct).
    * Weights are rounded to 4dp so cross-engine `ln` ulp noise cannot
    * surface. N is a single driver scalar (one count job), the same bounded
    * driver-action class as the merge layer's max-id lookups.
    */
  def tfidf(docs: DataFrame, id: String, text: String): DataFrame = {
    val n = docs.count()
    val tf = docs
      .select(col(id), explode(TextOps.tokens(col(text))).as("token"))
      .groupBy(col(id), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token")
      .select(col(id), col("token"), col("tf"), col("df"),
        round(col("tf") * log(lit(n).cast("double") / col("df")), 4).as("tfidf"))
  }

  /** Benchmark decontamination: ids of `train` documents sharing ANY token
    * `n`-gram with the `eval` set — the standard pre-training hygiene pass
    * that keeps test benchmarks out of the training corpus.
    *
    * The eval side collapses to a distinct set of 60-bit portable n-gram
    * hashes and BROADCASTS (eval benchmarks are tiny next to a training
    * corpus), so the 100 TB train side is one narrow projection + broadcast
    * semi-join — no shuffle of train data at all. Hash collisions can only
    * over-flag (a false contamination), never miss one.
    */
  def contaminated(train: DataFrame, eval: DataFrame, id: String, text: String,
      n: Int = 5): DataFrame = {
    val evalGrams = eval
      .select(explode(TextOps.ngramHashes(col(text), n)).as("g")).distinct()
    train.select(col(id), explode(TextOps.ngramHashes(col(text), n)).as("g"))
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .select(col(id)).distinct()
  }

  /** Deterministic data-mixture resampling: downsample each stratum (e.g.
    * language or source) toward caller-specified target WEIGHTS, yielding a
    * corpus of roughly `targetFraction` × the input in which stratum `l`
    * holds ≈ `weights(l)` of the mass. The per-stratum keep rate is
    * `min(1, w_l * targetFraction * N / n_l)` — downsample-only, the
    * standard mixture pass before training (upsampling is an epoch policy,
    * not a data transform).
    *
    * Determinism: a document survives iff `md5Long(text) mod 10^6` falls
    * under `floor(rate × 10^6)` — content-addressed, so reruns and engines
    * agree row-for-row (the oracle restates the whole derivation), and
    * the same doc keeps/drops consistently as the corpus grows only via
    * rate drift, never via RNG state.
    *
    * Shape at 100 TB: stratum counts are one map-side-combined aggregate,
    * collected to the DRIVER (bounded by stratum cardinality — languages or
    * sources, not rows; the same bounded driver-action class as the merge
    * layer's max-id lookups and k-means centroid rounds). The rates become
    * literal thresholds, so the corpus side is ONE narrow filtered scan —
    * no join, no shuffle, nothing but the aggregate touches the cluster
    * twice. (A broadcast-join formulation planned a BroadcastNestedLoopJoin
    * for the 1-row total frame — PlanAuditSpec caught it.)
    */
  def mixtureSample(docs: DataFrame, strata: String, text: String,
      weights: Map[String, Double], targetFraction: Double): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1, "targetFraction in (0,1]")
    // mixture configs are string-keyed, so the stratum column is compared AS
    // a string — a numeric source-id column casts rather than throwing
    // ClassCastException at the driver collect
    val sCol = col(strata).cast("string")
    val counts = docs.groupBy(sCol.as("__stratum")).agg(count(lit(1)).as("__n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    // absent strata get threshold 0 (dropped) — explicit, like mixture
    // configs that enumerate every kept source. A NULL stratum can never be
    // a weights key, so null-stratum rows are likewise dropped (they still
    // count toward `total`, matching the oracle's plain count(*)) — pinned
    // by CorpusSpec. Same arithmetic (and operation order) as the SQL
    // oracle, so the doubles are bit-identical
    val thresholds: Map[String, Long] = counts.collect { case (Some(l), n) =>
      val rate = math.min(1.0, weights.getOrElse(l, 0.0) * targetFraction * total / n)
      l -> math.floor(rate * 1000000d).toLong
    }
    val hash = pmod(TextOps.md5Long(col(text)), lit(1000000L))
    if (thresholds.size <= 64) {
      // few strata (languages): literal CASE chain — joinless narrow scan
      val thr = thresholds.foldLeft(lit(0L)) { case (acc, (l, t)) =>
        when(sCol === l, lit(t)).otherwise(acc)
      }
      docs.filter(hash < thr)
    } else {
      // many strata (e.g. per-source mixtures, 10^3-10^4 keys): a literal
      // chain that long breaks whole-stage codegen, so ship the thresholds
      // as a broadcast DATA-row table instead (data rows keep the equi-join
      // a BroadcastHashJoin — literal-column seeds would fold the key and
      // degrade to a nested loop, the FoldablePropagation trap)
      val spark = docs.sparkSession
      val thrDf = spark.createDataFrame(
        spark.sparkContext.parallelize(thresholds.toSeq.map {
          case (l, t) => org.apache.spark.sql.Row(l, t)
        }),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__stratum",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("__thr",
            org.apache.spark.sql.types.LongType))))
      docs.join(broadcast(thrDf), sCol === col("__stratum"))
        .filter(hash < col("__thr"))
        .drop("__stratum", "__thr")
    }
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * shards. Docs are packed greedily in `id` order within each `packKey`
    * group (e.g. language or domain — shards stay homogeneous): shard =
    * exclusive-prefix-sum(tokens) DIV budget, so a shard closes once the
    * budget is crossed and the straddling document opens the next one.
    *
    * A naive `Window.partitionBy(packKey)` running sum puts each key's
    * ENTIRE group through one sorted reducer task — and the documented use
    * packs by LANGUAGE, where real pretraining corpora are ~half one key:
    * at 100 TB the English partition is a single task. This is instead the
    * classic two-pass distributed prefix sum, skew-immune because no stage
    * ever holds more than one RANGE partition of (key, id):
    *
    *   1. range-partition a NARROW (id, key, n_toks) projection by
    *      (key, id) — the range partitioner splits a dominant key across
    *      as many contiguous, sorted blocks as it needs;
    *   2. per-(key, block) token subtotals — tiny (≈ blocks + keys rows,
    *      each block holds few distinct keys because ranges are contiguous);
    *   3. exclusive running offsets over the subtotals (a window over the
    *      TINY frame, broadcast back);
    *   4. prefix = block offset + local running sum within (block, key) —
    *      the window partition is now bounded by the range-partition size,
    *      never by the key's corpus share;
    *   5. join (id → shard) back to the full rows on the unique `id`.
    *
    * Block identity is `spark_partition_id()` pinned by a persist of the
    * narrow blocked frame (range-partitioner sampling is not re-run, so the
    * subtotal pass and the local-prefix pass see identical blocks); like
    * [[Dedup.connectedComponents]]' labels, the returned frame references
    * the persisted narrow plan and Spark's ContextCleaner reclaims it when
    * the result is released. `id` must be unique per document (it is a doc
    * id) — VALIDATED, not assumed: the planning aggregate counts ids vs
    * distinct ids and refuses duplicates (and >1 null) loudly rather than
    * letting the join-back multiply rows. Inputs at or below
    * `smallInputRows` take the naive single-window fast path instead (both
    * paths produce identical assignments; target/shardprobe.json records
    * the crossover).
    *
    * Returns the input keyed with `n_toks`, `shard` (0-based per group).
    */
  def packShards(docs: DataFrame, id: String, text: String, packKey: Column,
      budgetTokens: Long, smallInputRows: Long = SmallInputRows,
      maxBroadcastOffsetRows: Long = MaxBroadcastOffsetRows): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val withToks = docs
      .withColumn("n_toks", TextOps.tokenCountWs(col(text)).cast(LongType))
    val narrow = withToks.select(col(id), packKey.as("__pk"), col("n_toks"))
    // ONE bounded aggregate over the narrow projection plans the whole
    // operator: the row count picks the path (below the crossover the naive
    // per-key window is ~2× faster than the two extra distributed passes —
    // target/shardprobe.json records both), the pack-key cardinality bounds
    // the offsets frame (contiguous ranges ⇒ ≤ blocks + keys − 1 rows, so a
    // high-cardinality per-domain packKey must NOT broadcast), and id
    // uniqueness is VALIDATED — a duplicate id, or a second null id that the
    // null-safe join-back would match, row-multiplies the join and corrupts
    // shard assignment silently.
    val chk = narrow.agg(count(lit(1)), count(col(id)), countDistinct(col(id)),
      countDistinct(col("__pk"))).head()
    val (nRows, nNonNull, nIds, nKeys) =
      (chk.getLong(0), chk.getLong(1), chk.getLong(2), chk.getLong(3))
    require(nIds == nNonNull && nRows - nNonNull <= 1L,
      s"packShards requires unique '$id' values (and at most one null id): " +
        s"$nRows rows carry $nIds distinct non-null ids and " +
        s"${nRows - nNonNull} nulls")
    if (nRows <= smallInputRows) {
      // small-input fast path: one sorted reducer per key is FINE when the
      // largest key fits one task — no blocked frame, no join-back
      val w = Window.partitionBy(packKey).orderBy(col(id))
      return withToks.withColumn("shard",
        floor((sum(col("n_toks")).over(w) - col("n_toks")) / budgetTokens)
          .cast(LongType))
    }
    val nBlocks = docs.sparkSession.sessionState.conf.numShufflePartitions
    val blocked = narrow
      .repartitionByRange(nBlocks, col("__pk"), col(id))
      .sortWithinPartitions(col("__pk"), col(id))
      .withColumn("__blk", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wOff = Window.partitionBy(col("__pk")).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blocked.groupBy(col("__pk"), col("__blk"))
      .agg(sum(col("n_toks")).as("__sub"))
      .withColumn("__off", coalesce(sum(col("__sub")).over(wOff), lit(0L)))
      .select(col("__pk").as("__opk"), col("__blk").as("__oblk"), col("__off"))
    // offsets hold ≤ nBlocks + nKeys − 1 rows (each range block's key set is
    // contiguous, so adjacent blocks share at most one key): broadcast only
    // when that bound actually fits; a per-domain packKey with millions of
    // keys falls back to a shuffle join, which the (pk, blk) equi-key keeps
    // a plain hash join
    val offsetsFit = nBlocks.toLong + nKeys - 1L <= maxBroadcastOffsetRows
    val wLoc = Window.partitionBy(col("__blk"), col("__pk")).orderBy(col(id))
    val assignment = blocked
      .join(if (offsetsFit) broadcast(offsets) else offsets,
        col("__pk") <=> col("__opk") && col("__blk") === col("__oblk"))
      .withColumn("shard",
        floor((col("__off") + sum(col("n_toks")).over(wLoc) - col("n_toks"))
          / budgetTokens).cast(LongType))
      .select(col(id), col("shard"))
    // null-safe join back so a null-id row keeps its (degenerate) shard
    // instead of silently vanishing from the output — safe against row
    // multiplication because id uniqueness was validated above
    withToks.alias("d").join(assignment.alias("a"),
        col(s"d.$id") <=> col(s"a.$id"))
      .select(withToks.columns.map(c => col(s"d.$c")) :+ col("a.shard"): _*)
  }

  /** [[packShards]] path thresholds: below `SmallInputRows` total rows the
    * naive window wins (shardprobe-measured ~2× at 80 k rows — fixed
    * per-stage overhead dominates); the offsets broadcast cap is in ROWS of
    * the tiny (key, block) frame, ~40 B each ⇒ ≈4 MB at the cap.
    */
  private val SmallInputRows = 1000000L
  private val MaxBroadcastOffsetRows = 100000L

  /** Deterministic global training-order shuffle: the per-epoch permutation
    * a training run needs over the whole corpus, as a pure function of
    * (seed, id) — `shuffle_key = md5Long(seed ":" id)`, order =
    * (shuffle_key, id). No RNG state anywhere: the same seed replays
    * bit-identically on any cluster size or engine (the oracle restates it
    * in SQL), a different seed is an independent permutation (the next
    * epoch), and late-arriving documents slot into their positions without
    * moving anyone else's relative order. Shape at 100 TB: ONE total sort —
    * Spark's sample-based range partition — with no skew possible (the key
    * is a uniform hash), which is exactly how a corpus-wide shuffle should
    * run on a 1000-executor cluster; never collect-and-permute.
    */
  def shuffleDeterministic(docs: DataFrame, id: String, seed: Long): DataFrame =
    docs
      .withColumn("shuffle_key", TextOps.md5Long(
        concat(lit(seed.toString), lit(":"), col(id).cast("string"))))
      .orderBy(col("shuffle_key"), col(id))

  /** Deterministic train/validation/test split by ID hash — the assignment
    * every training pipeline makes exactly once and must never revisit:
    * membership is a pure function of the document ID (`md5Long(id as
    * string) mod 100` — the repo's md5 convention, restated in SQL by the
    * `doc_split` oracle), so reruns, engines, and corpus GROWTH all agree —
    * a document keeps its split forever, new arrivals distribute
    * proportionally, and nothing resembles RNG state. ID-addressed rather
    * than content-addressed deliberately: an edited document must STAY in
    * its split (content addressing would let eval examples migrate into
    * train on revision — the leak the split exists to prevent).
    *
    * `splits` are (name, percent) in declaration order, summing to 100;
    * bucket ranges are assigned cumulatively (80/10/10 → train [0,80),
    * val [80,90), test [90,100)). Shape: one narrow projection, no
    * shuffle, no join — the label is a literal CASE chain over the hash.
    */
  def assignSplit(docs: DataFrame, id: String, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits need positive percents")
    require(splits.map(_._2).sum == 100,
      s"split percents must sum to 100, got ${splits.map(_._2).sum}")
    require(splits.map(_._1).distinct.size == splits.size, "duplicate split names")
    val bucket = pmod(TextOps.md5Long(col(id).cast("string")), lit(100L))
    val (label, _) = splits.foldLeft((lit(null).cast("string"), 0)) {
      case ((e, lo), (name, pct)) =>
        (when(bucket >= lo && bucket < lo + pct, name).otherwise(e), lo + pct)
    }
    docs.withColumn("split", label)
  }
}
