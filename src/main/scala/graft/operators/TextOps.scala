package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, language-ID, quality scoring, token counting and
  * document fingerprinting. Everything is a pure `Column` expression chain —
  * narrow, shuffle-free, codegen-eligible — so a 100 TB document scan runs
  * these at I/O speed.
  *
  * Hash primitive: `md5Long` = first 15 hex chars (60 bits) of md5, so the
  * correctness oracle can reproduce every derived value in ANSI SQL
  * (`('0x' || substr(md5(s),1,15))::BIGINT`) — deliberately engine-portable,
  * unlike xxhash64/murmur whose bit-layout is engine-private.
  */
object TextOps {

  /** Mersenne prime 2^31-1; universal-hash modulus. (a*h+b) stays < 2^62. */
  val P31 = 2147483647L

  /** 60-bit deterministic string hash, portable across engines. */
  def md5Long(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** md5Long folded into [0, 2^31-1). */
  def h31(c: Column): Column = pmod(md5Long(c), lit(P31))

  /** Whitespace tokens, empties dropped (trailing-space-safe). */
  def tokens(c: Column): Column = filter(split(c, " "), t => t =!= "")

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: letter runs, digit runs, single punctuation —
    * the standard pre-tokenizer shape (letters | digits | non-space symbol).
    */
  def tokenCountBpe(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Character k-shingles (empty array when the text is shorter than k). */
  def shingles(c: Column, k: Int): Column =
    when(length(c) >= k,
      transform(sequence(lit(1), length(c) - k + 1), i => c.substr(i, lit(k))))
      .otherwise(array().cast("array<string>"))

  def distinctShingles(c: Column, k: Int): Column = array_distinct(shingles(c, k))

  /** Distinct k-shingle count via the single-pass custom expression
    * (= `size(distinctShingles)` with no array materialization).
    */
  def distinctShingleCount(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.shims.column(
      graft.functions.ShingleCountExpr(org.apache.spark.sql.graft.shims.expression(c), k))

  /** Stopword lists for the n-gram language-ID heuristic. Tiny on purpose:
    * they broadcast as literals inside the expression; real deployments swap
    * in larger lists without changing the plan shape.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "los", "del", "se", "por"),
    "de" -> Seq("der", "die", "das", "und", "den", "von", "zu", "mit", "ist", "ein"),
    "fr" -> Seq("le", "les", "et", "un", "une", "du", "est", "pour", "dans", "sur"))

  def stopwordHits(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), t => t.isInCollection(words)))

  /** Deterministic argmax language guess with fixed tie-break order
    * (en > es > de > fr > unknown-when-all-zero).
    */
  def languageId(c: Column): Column = {
    val scores = stopwords.map { case (lang, words) => lang -> stopwordHits(c, words) }
    val Seq(en, es, de, fr) = scores.map(_._2)
    when(en + es + de + fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Quality components (each independently useful as a filter column). */
  def alphaChars(c: Column): Column = length(c) - length(regexp_replace(c, "[A-Za-z]", ""))
  def digitChars(c: Column): Column = length(c) - length(regexp_replace(c, "[0-9]", ""))
  def punctChars(c: Column): Column = length(c) - length(regexp_replace(c, "[^A-Za-z0-9\\s]", ""))

  /** Single-pass count profile `[wsTokens, alpha, punct, s_en, s_es, s_de,
    * s_fr, s_any]` (see [[graft.functions.TextProfileExpr]]); feed to the
    * `*FromProfile` variants to avoid six tokenization passes per row.
    */
  def textProfile(c: Column): Column =
    org.apache.spark.sql.graft.shims.column(
      graft.functions.TextProfileExpr(
        org.apache.spark.sql.graft.shims.expression(c), stopwords.map(_._2)))

  /** [[languageId]] computed from a [[textProfile]] column — identical CASE
    * chain over identical counts.
    */
  def languageIdFromProfile(p: Column): Column = {
    val Seq(en, es, de, fr) = (0 until 4).map(i => element_at(p, 4 + i))
    when(en + es + de + fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** [[qualityScore]] computed from a [[textProfile]] column — the identical
    * native arithmetic tree, with the counts sourced from the one-pass scan.
    */
  def qualityScoreFromProfile(c: Column, p: Column): Column = {
    val len = length(c).cast("double")
    val alphaRatio = element_at(p, 2).cast("double") / greatest(len, lit(1.0))
    val punctRatio = element_at(p, 3).cast("double") / greatest(len, lit(1.0))
    val toks = element_at(p, 1).cast("double")
    val meanTokLen = (len - (toks - 1)) / greatest(toks, lit(1.0))
    val tokShape = when(meanTokLen >= 3 && meanTokLen <= 10, lit(1.0)).otherwise(lit(0.0))
    val stopRatio = element_at(p, 8).cast("double") / greatest(toks, lit(1.0))
    round(lit(0.5) * alphaRatio + lit(0.2) * tokShape
      + lit(0.3) * least(stopRatio * 3, lit(1.0)) - lit(0.2) * punctRatio, 4)
  }

  /** Composite quality score in [0,1]: alpha density + token-shape sanity +
    * stopword presence, a standard pre-training heuristic mix. Deterministic
    * double arithmetic, rounded so cross-engine float noise can't flip it.
    */
  def qualityScore(c: Column): Column = {
    val len = length(c).cast("double")
    val alphaRatio = alphaChars(c) / greatest(len, lit(1.0))
    val punctRatio = punctChars(c) / greatest(len, lit(1.0))
    val toks = tokenCountWs(c).cast("double")
    val meanTokLen = (len - (toks - 1)) / greatest(toks, lit(1.0))
    val tokShape = when(meanTokLen >= 3 && meanTokLen <= 10, lit(1.0)).otherwise(lit(0.0))
    val stopRatio = stopwordHits(c, stopwords.flatMap(_._2)) / greatest(toks, lit(1.0))
    round(lit(0.5) * alphaRatio + lit(0.2) * tokShape
      + lit(0.3) * least(stopRatio * 3, lit(1.0)) - lit(0.2) * punctRatio, 4)
  }

  /** Single-pass intra-document repetition counts `[nToks, maxTokCount,
    * nTrigrams, nDistinctTrigrams]` (see
    * [[graft.functions.RepetitionStatsExpr]]) — the inputs to Gopher-style
    * duplicate-n-gram quality rules. Derived ratios (top-token fraction,
    * duplicate-trigram fraction) are exact integer divisions: compute them
    * UNROUNDED — IEEE division of identical integer-valued doubles is
    * bit-exact across engines, while rounding a derived division is not.
    */
  def repetitionStats(c: Column): Column =
    org.apache.spark.sql.graft.shims.column(
      graft.functions.RepetitionStatsExpr(org.apache.spark.sql.graft.shims.expression(c)))

  /** Built-in-composition form of [[repetitionStats]] (executable spec:
    * sorts the token array per row and runs interpreted lambdas — the
    * max-run-of-sorted equals the max token multiplicity).
    */
  def repetitionStatsComposed(c: Column): Column = {
    val toks = tokens(c)
    val nt = size(toks)
    val zero = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
    val maxCount = aggregate(array_sort(toks), zero,
      (s, t) => {
        val run = when(t === s.getField("prev"), s.getField("run") + 1).otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"), greatest(s.getField("best"), run).as("best"))
      },
      s => s.getField("best"))
    val tris = when(nt >= 3,
      transform(sequence(lit(1), nt - 2),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    array(nt.cast(LongType), maxCount,
      size(tris).cast(LongType), size(array_distinct(tris)).cast(LongType))
  }

  /** Sliding token-window chunking — the standard long-document
    * preprocessing step before tokenizer-bounded model input. Windows of
    * `chunkSize` whitespace tokens advance by `chunkSize - overlap`; the
    * last window starts at the smallest step multiple covering the final
    * token, so every token lands in ≥ 1 chunk. Pure per-row Column logic —
    * no explode until the caller chooses to, no shuffle.
    */
  def chunkByTokens(c: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need chunkSize > 0 and 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val toks = tokens(c)
    val n = size(toks)
    // ceil over exact small-int doubles — reproduces identically in SQL,
    // unlike integer division whose negative rounding differs across engines
    val kMinus1 = greatest(
      ceil((n - lit(chunkSize)).cast("double") / step).cast("int"), lit(0))
    when(n === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), kMinus1),
        i => concat_ws(" ", slice(toks, i * step + lit(1), lit(chunkSize)))))
  }

  /** Token `n`-gram 60-bit portable hashes (space-joined gram → [[md5Long]]);
    * empty array when the document has fewer than `n` tokens. The hash keeps
    * the downstream join/shuffle payload at 8 bytes per gram instead of the
    * gram text, and reproduces exactly in the SQL oracle.
    */
  def ngramHashes(c: Column, n: Int): Column = {
    require(n > 0, "n must be positive")
    val toks = tokens(c)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - n + 1),
        i => md5Long(concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Curation-grade PII masking: URLs, then emails, then long digit runs
    * (order matters — URLs and emails contain digits). Deliberately simple
    * engine-portable regexes; a production deployment swaps in its own
    * pattern set without changing the plan shape (three fused
    * `regexp_replace` calls in one codegen'd projection).
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, "https?://[^\\s]+", "<URL>"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "[0-9]{7,}", "<NUM>")

  /** Positional rolling-hash document fingerprint:
    * sum_i( i * h31(shingle_i) ) mod 2^31-1 over overlapping k-shingles.
    * Order-sensitive (a permuted document fingerprints differently) yet
    * expressible as a commutative SUM, so it runs as one map-side pass and
    * reproduces exactly in the SQL oracle. Uses the single-pass custom
    * expression; [[fingerprintComposed]] keeps the built-in-only form.
    */
  def fingerprint(c: Column, k: Int = 8): Column =
    org.apache.spark.sql.graft.shims.column(
      graft.functions.FingerprintExpr(org.apache.spark.sql.graft.shims.expression(c), k))

  /** Built-in-composition form of [[fingerprint]] (slower: materializes the
    * term array and runs lambdas interpreted; kept as executable spec).
    */
  def fingerprintComposed(c: Column, k: Int = 8): Column = {
    // each term and the running sum are reduced mod P — a raw sum overflows
    // 2^63 for megabyte documents; per-step reduction keeps every
    // intermediate < 2^32 and bit-agrees with FingerprintExpr at any length
    val terms = when(length(c) >= k,
      transform(sequence(lit(1), length(c) - k + 1),
        i => pmod(pmod(i.cast(LongType), lit(P31)) * h31(c.substr(i, lit(k))), lit(P31))))
      .otherwise(array().cast("array<bigint>"))
    aggregate(terms, lit(0L), (acc, x) => pmod(acc + x, lit(P31)))
  }
}
