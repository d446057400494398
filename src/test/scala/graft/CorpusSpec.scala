package graft

import graft.operators.{Corpus, TextOps}
import org.apache.spark.sql.functions._

/** Corpus-level operators: top-k tokens, TF-IDF, decontamination, packing. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat on the log"),
    (2L, "a b c d e f g h"),
    (3L, "the cat sat on the mat today")).toDF("doc_id", "text")

  test("topTokens counts globally with deterministic tie-break") {
    val top = Corpus.topTokens(docs, "text", 3).as[(String, Long)].collect()
    assert(top.head == ("the", 6))
    // sat/on tie at 3 → token asc
    assert(top.slice(1, 3).toSeq == Seq(("on", 3), ("sat", 3)))
  }

  test("topTokensSketch: bounded-state MG candidates recount to the exact answer") {
    // identical to the exact path on the fixture
    val exact = Corpus.topTokens(docs, "text", 3).as[(String, Long)].collect().toSeq
    val sketched = Corpus.topTokensSketch(docs, "text", 3)
      .as[(String, Long)].collect().toSeq
    assert(sketched == exact, s"sketch $sketched vs exact $exact")
    // a skewed synthetic corpus with vocabulary >> capacity: the summary
    // still certifies and recounts the true heavy hitters exactly
    val skew = spark.range(0, 30000).select(
      concat(lit("hot"), pmod(col("id"), lit(5))).as("text"))
      .unionByName(spark.range(0, 8000).select(
        concat(lit("cold"), col("id")).as("text")))
    val top = Corpus.topTokensSketch(skew, "text", 5, capacity = 64)
      .as[(String, Long)].collect().toSeq
    assert(top == (0 until 5).map(i => (s"hot$i", 6000L)), s"got $top")
    // the certification refuses when capacity cannot separate the tail:
    // an all-distinct corpus has no heavy hitters to certify
    val flat = spark.range(0, 5000).select(concat(lit("t"), col("id")).as("text"))
    val e = intercept[RuntimeException](
      Corpus.topTokensSketch(flat, "text", 5, capacity = 16))
    assert(e.getMessage.contains("cannot certify"), e.getMessage)
  }

  test("tfidf: corpus-wide tokens score zero, rare tokens score high") {
    val w = Corpus.tfidf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    // "sat" appears in 3 of 4 docs: idf = ln(4/3) > 0 but small
    assert(w((0L, "sat")) == math.rint(math.log(4.0 / 3) * 1e4) / 1e4)
    // "dog" only in doc 1: tf=1, idf=ln(4)
    assert(w((1L, "dog")) == math.rint(math.log(4.0) * 1e4) / 1e4)
    // tf scales linearly: "the" tf=2 in doc 0
    assert(w((0L, "the")) == math.rint(2 * math.log(4.0 / 3) * 1e4) / 1e4)
  }

  test("contaminated flags train docs sharing an n-gram with eval only") {
    val train = docs.filter($"doc_id" =!= 0L)
    val eval = docs.filter($"doc_id" === 0L)
    // doc 3 shares "the cat sat on the (mat)" 5-grams with doc 0; docs 1, 2 do not
    val hit = Corpus.contaminated(train, eval, "doc_id", "text", n = 5)
      .as[Long].collect().toSeq
    assert(hit == Seq(3L))
  }

  test("ngramHashes: short docs yield empty, grams are order-sensitive") {
    val g = docs.select(size(TextOps.ngramHashes($"text", 5)).as("n"))
      .as[Int].collect()
    assert(g.toSeq == Seq(2, 2, 4, 3)) // nTokens - n + 1, never negative
    val rev = Seq((0L, "mat the on sat cat the")).toDF("doc_id", "text")
    val h1 = docs.filter($"doc_id" === 0L)
      .select(TextOps.ngramHashes($"text", 5)).as[Seq[Long]].head()
    val h2 = rev.select(TextOps.ngramHashes($"text", 5)).as[Seq[Long]].head()
    assert(h1.intersect(h2).isEmpty)
  }

  test("packShards respects the budget boundary per group") {
    val d = (0L until 20L).map(i => (i, if (i % 2 == 0) "en" else "es",
      Seq.fill(10)("tok").mkString(" "))).toDF("doc_id", "lang", "text")
    val packed = Corpus.packShards(d, "doc_id", "text", $"lang", budgetTokens = 25)
      .select($"doc_id", $"lang", $"n_toks", $"shard")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // each lang has 10 docs × 10 tokens; shard = floor(exclusive-cumsum/25)
    // → shards of sizes [3,2,2,3] docs per lang (cumsum 0,10,20|30,40|50,60|70,80,90)
    val en = packed.filter(_._2 == "en").map(_._4).toSeq
    assert(en == Seq(0, 0, 0, 1, 1, 2, 2, 2, 3, 3))
    // within a group, shard ids are nondecreasing in doc order
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val shards = rows.sortBy(_._1).map(_._4).toSeq
      assert(shards == shards.sorted)
    }
  }

  test("packShards: distributed prefix sum ≡ naive window on a 90%-one-key corpus") {
    // the scale shape packShards exists for: one language dominates, so the
    // dominant key MUST span many range blocks (32 shuffle partitions vs
    // 2000 rows) — the per-block offsets have to chain exactly or shard
    // boundaries drift at every block seam. Null key = a real group too.
    val d = (0L until 2000L).map { i =>
      val lang = if (i % 10 == 0) (if (i % 20 == 0) null else "es") else "en"
      (i, lang, Seq.fill((i % 7 + 1).toInt)("tok").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    // force the distributed path (the auto-select would take the naive
    // fast path at 2000 rows) — this test IS the block-seam evidence
    val got = Corpus.packShards(d, "doc_id", "text", $"lang", budgetTokens = 40,
        smallInputRows = 0L)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toMap
    // oracle: the single-reducer window restated locally
    val rows = d.select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getString(2).split("\\s+").count(_.nonEmpty).toLong))
    val want = rows.groupBy(_._2).toSeq.flatMap { case (_, grp) =>
      var cum = 0L
      grp.sortBy(_._1).toSeq.map { case (id, _, n) =>
        val s = cum / 40; cum += n; id -> s
      }
    }.toMap
    assert(got.size == 2000 && want.forall { case (id, s) => got(id) == s },
      s"first mismatches: ${want.filter { case (id, s) => got(id) != s }.take(5)}")
  }

  test("packShards: duplicate/multi-null ids refused; shuffle-join fallback agrees") {
    // a duplicate id would row-multiply the join-back — refused loudly at
    // planning time, on BOTH paths
    val dup = Seq((1L, "en", "a b"), (1L, "en", "c d"), (2L, "en", "e"))
      .toDF("doc_id", "lang", "text")
    val e1 = intercept[IllegalArgumentException](
      Corpus.packShards(dup, "doc_id", "text", $"lang", 10))
    assert(e1.getMessage.contains("unique"), e1.getMessage)
    // two null ids match EACH OTHER under the null-safe join — also refused
    val nulls = Seq[(java.lang.Long, String, String)](
      (null, "en", "a"), (null, "en", "b"), (1L, "en", "c"))
      .toDF("doc_id", "lang", "text")
    val e2 = intercept[IllegalArgumentException](
      Corpus.packShards(nulls, "doc_id", "text", $"lang", 10))
    assert(e2.getMessage.contains("null"), e2.getMessage)
    // ONE null id stays legal and keeps its degenerate shard
    val oneNull = Seq[(java.lang.Long, String, String)](
      (null, "en", "a b c"), (1L, "en", "d e"))
      .toDF("doc_id", "lang", "text")
    assert(Corpus.packShards(oneNull, "doc_id", "text", $"lang", 10,
      smallInputRows = 0L).count() == 2)
    // high-cardinality packKey: the offsets frame must not broadcast — the
    // shuffle-join fallback (cap forced to 0) assigns identically
    val d = (0L until 400L).map(i => (i, s"dom${i % 37}",
      Seq.fill((i % 5 + 1).toInt)("tok").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    def run(cap: Long) = Corpus.packShards(d, "doc_id", "text", $"lang", 9,
        smallInputRows = 0L, maxBroadcastOffsetRows = cap)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toMap
    assert(run(100000L) == run(0L))
  }

  test("shuffleDeterministic: seed-keyed permutation, epoch-stable, seeds independent") {
    val d = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def order(seed: Long): Seq[Long] =
      Corpus.shuffleDeterministic(d, "doc_id", seed)
        .select($"doc_id").as[Long].collect().toSeq
    val e0 = order(7L)
    // a permutation of the corpus (total, no dupes), not the input order
    assert(e0.sorted == (0L until 500L) && e0 != (0L until 500L).toSeq)
    // the same seed replays bit-identically (epoch stability)
    assert(order(7L) == e0)
    // a different seed is a different permutation (the next epoch)
    val e1 = order(8L)
    assert(e1.sorted == (0L until 500L) && e1 != e0)
    // positions are a pure function of (seed, id): a corpus SUBSET keeps
    // every surviving document's relative order (curation after shuffle
    // assignment cannot reorder training)
    val sub = Corpus.shuffleDeterministic(
      d.filter($"doc_id" % 3 === 0), "doc_id", 7L)
      .select($"doc_id").as[Long].collect().toSeq
    assert(sub == e0.filter(_ % 3 == 0))
  }

  test("mixtureSample: deterministic, rate-capped, drops unweighted strata") {
    val d = (0L until 300L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "es" else "zz",
        s"document number $i with some text")).toDF("doc_id", "lang", "text")
    // en/es weighted; zz absent → dropped entirely
    val weights = Map("en" -> 0.7, "es" -> 0.3)
    val s1 = Corpus.mixtureSample(d, "lang", "text", weights, targetFraction = 0.5)
      .select($"doc_id", $"lang").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(s1.nonEmpty && !s1.exists(_._2 == "zz"))
    // subset of input, and a rerun is row-identical (content-addressed rule)
    assert(s1.map(_._1).forall(_ < 300L))
    val s2 = Corpus.mixtureSample(d, "lang", "text", weights, targetFraction = 0.5)
      .select($"doc_id", $"lang").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(s1 == s2)
    // rate cap: a stratum whose target exceeds its size keeps ALL its rows
    val all = Corpus.mixtureSample(d, "lang", "text", Map("en" -> 1.0), 1.0)
      .select($"lang").as[String].collect()
    assert(all.length == 100 && all.forall(_ == "en"))
    // expected keep rate ≈ w*frac*N/n = 0.7*0.5*300/100 = 1.05 → capped to 1
    // for en at frac 0.7: sanity-check the es rate actually thins the stratum
    val es = s1.count(_._2 == "es")
    assert(es > 10 && es < 100, s"es sampled $es of 100")
  }

  test("mixtureSample broadcast-join path (many strata) matches the rule exactly") {
    val n = 70 // > the literal-chain cutoff, forces the join formulation
    val d = (0 until 700).map(i => (i.toLong, s"s${i % n}", s"body text $i"))
      .toDF("doc_id", "strata", "text")
    val weights = (0 until n).map(i => s"s$i" -> (if (i % 2 == 0) 0.02 else 0.0)).toMap
    val got = Corpus.mixtureSample(d, "strata", "text", weights, targetFraction = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    def md5mod(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000000L
    }
    val expected = (0 until 700).filter { i =>
      val rate = math.min(1.0, weights(s"s${i % n}") * 0.5 * 700.0 / 10.0)
      md5mod(s"body text $i") < math.floor(rate * 1000000d).toLong
    }.map(_.toLong).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("mixtureSample: null strata drop but count toward total; numeric strata cast") {
    // 100 en + 100 null-stratum rows. Null can never match a string-keyed
    // weights config, so null rows are dropped — but they DO inflate the
    // total (count(*) semantics), which raises en's keep rate:
    // rate_en = 1.0 * 0.5 * 200 / 100 = 1.0 → every en row kept.
    val d = (0L until 200L).map(i =>
      (i, if (i < 100) "en" else null, s"some text $i")).toDF("doc_id", "lang", "text")
    val kept = Corpus.mixtureSample(d, "lang", "text", Map("en" -> 1.0), 0.5)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    assert(kept.length == 100 && kept.forall(_._2 == "en"))

    // a numeric stratum column casts to its string form instead of throwing
    // ClassCastException at the driver collect; weights key on "0"/"1"
    val dn = (0L until 100L).map(i => (i, i % 2, s"numeric text $i"))
      .toDF("doc_id", "src", "text")
    val keptN = Corpus.mixtureSample(dn, "src", "text", Map("0" -> 1.0), 1.0)
      .select($"src").as[Long].collect()
    assert(keptN.length == 50 && keptN.forall(_ == 0L))
  }

  test("split: total, deterministic, id-addressed, proportional, bad configs refused") {
    val d = (0L until 1000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val got = Corpus.assignSplit(d, "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    // total: every row labeled, labels only from the config
    assert(got.size == 1000 && got.values.toSet == Set("train", "val", "test"))
    // deterministic: a rerun is row-identical
    val again = Corpus.assignSplit(d, "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(again == got)
    // id-addressed: editing the text moves nothing between splits
    val edited = (0L until 1000L).map(i => (i, s"REVISED $i")).toDF("doc_id", "text")
    val gotE = Corpus.assignSplit(edited, "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(gotE == got, "content must not influence split membership")
    // proportional within hash tolerance at n=1000
    val counts = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 700 && counts("train") < 900, s"train skewed: $counts")
    assert(counts("val") > 50 && counts("val") < 160, s"val skewed: $counts")
    // growth: new ids distribute without disturbing old assignments
    val grown = (0L until 2000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val gotG = Corpus.assignSplit(grown, "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(got.forall { case (k, v) => gotG(k) == v }, "growth reassigned old ids")
    // bad configs refuse loudly
    intercept[IllegalArgumentException](Corpus.assignSplit(d, "doc_id", Seq("a" -> 50)))
    intercept[IllegalArgumentException](
      Corpus.assignSplit(d, "doc_id", Seq("a" -> 50, "a" -> 50)))
    intercept[IllegalArgumentException](
      Corpus.assignSplit(d, "doc_id", Seq("a" -> 100, "b" -> 0)))
  }
}
