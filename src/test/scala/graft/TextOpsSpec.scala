package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._
import graft.operators.{TextAnalysis, TextDedup}

/** Specs for the text-analysis and dedup operators (extension tier). */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("redactPii: emails, URLs, IPv4, phone runs rewritten; per-pattern counts on raw") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.redactPii(docs(
      (1L, "mail a@b.co, fetch https://x.io/p?q=1 from 192.168.0.1 " +
        "or call +1 (555) 123-4567 now"),
      (2L, "server at 10.0.0.255 and 256.1.1.1 is still a dotted quad shape"),
      (3L, "plain words only, year 2024 alone is too short to be a phone"),
      (4L, ""),
      (5L, "released on 2024-01-01 and priced 12-34 in the spring table"),
      (6L, "between 2024-01-01 2024-01-02 the digits run together")),
      "doc_id", "text")
      .as[(Long, String, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == "mail <EMAIL>, fetch <URL> from <IP> or call <PHONE> now")
    assert(out(1L)._3 == 1 && out(1L)._4 == 1 && out(1L)._5 == 1 && out(1L)._6 == 1)
    // The IPv4 pattern is shape-based (1-3 digit octets), not
    // range-validated — 256.1.1.1 redacts too; deterministic > clever.
    assert(out(2L)._2 == "server at <IP> and <IP> is still a dotted quad shape")
    assert(out(2L)._5 == 2 && out(2L)._6 == 0)
    assert(out(3L)._2.contains("2024") && out(3L)._6 == 0,
      "a bare year must not be eaten by the phone pattern")
    assert(out(4L)._2 == "" && out(4L)._3 == 0)
    // ADVICE r07: the phone rule counts DIGITS (>= 9), so an ISO date
    // (8 digits) and short numeric table cells survive intact...
    assert(out(5L)._2.contains("2024-01-01") && out(5L)._2.contains("12-34") &&
      out(5L)._6 == 0, "single dates / short numeric runs are not phones")
    // ...while ADJACENT dates whose combined run reaches 9 digits are
    // the documented residue of the conservative-shaped contract.
    assert(out(6L)._2 == "between <PHONE> the digits run together" &&
      out(6L)._6 == 1, "adjacent-date runs redact as one documented residue")
  }

  test("tokens splits on whitespace and drops empties") {
    val out = docs((1L, "  a  b\tc ")).select(tokens($"text")).as[Seq[String]].head()
    assert(out == Seq("a", "b", "c"))
  }

  test("charShingles: distinct k-grams; short text falls back to whole text") {
    val out = docs((1L, "abab")).select(charShingles($"text", 2)).as[Seq[String]].head()
    assert(out == Seq("ab", "ba"))
    val short = docs((1L, "ab")).select(charShingles($"text", 5)).as[Seq[String]].head()
    assert(short == Seq("ab"))
  }

  test("wordShingles: distinct n-grams in order; short docs fall back") {
    val out = docs((1L, "a b c d"))
      .select(wordShingles(tokens($"text"), 3)).as[Seq[String]].head()
    assert(out == Seq("a b c", "b c d"))
    val short = docs((1L, "a b"))
      .select(wordShingles(tokens($"text"), 3)).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("minhashBandKeys equals the composed lshBandKeys(minhashSignature)") {
    val df = docs((1L, "the quick brown fox jumps over the lazy dog"))
      .select(wordShingles(tokens($"text"), 2).as("sh"))
    val fused = df.select(minhashBandKeys($"sh", 8, 4)).as[Seq[String]].head()
    val composed = df.select(lshBandKeys(minhashSignature($"sh", 8), 8, 4))
      .as[Seq[String]].head()
    assert(fused == composed,
      "fused band keys must be byte-identical to the composed form")
  }

  test("identical texts share signatures; signatures are deterministic") {
    val df = docs((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v"))
      .select($"doc_id", minhashSignature(wordShingles(tokens($"text"), 2), 16).as("sig"))
    val sigs = df.orderBy("doc_id").as[(Long, Seq[String])].collect()
    assert(sigs(0)._2 == sigs(1)._2)
    assert(sigs(0)._2 != sigs(2)._2)
    assert(sigs(0)._2.length == 16)
  }

  test("simhash: identical tokens -> identical sketch, hamming 0") {
    val df = docs((1L, "spark scala engine"), (2L, "spark scala engine"))
      .select(simhash32(tokenHashes(tokens($"text"))).as("s")).as[Long].collect()
    assert(df(0) == df(1))
    assert(df(0) >= 0L && df(0) < (1L << 32))
  }

  test("exact dedup groups normalized duplicates under min id") {
    val out = TextDedup.exact(
      docs((5L, "Hello World"), (2L, "  hello world "), (7L, "other")),
      "doc_id", "text")
    val groups = out.orderBy("canonical_id")
      .select("canonical_id", "n_dups").as[(Long, Long)].collect()
    assert(groups.toSeq == Seq((2L, 2L), (7L, 1L)))
  }

  test("ngramJaccardPairs finds planted near-dups, not unrelated docs") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " CHANGED"
    val other = (100 to 130).map(i => s"v$i").mkString(" ")
    val pairs = TextDedup.ngramJaccardPairs(
      docs((1L, base), (2L, nearDup), (3L, other)),
      "doc_id", "text", n = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("df-capped direct jaccard equals uncapped, including hot-only pairs via the risky residual (VERDICT r09 item 5)") {
    // The adversarial shape the cap exists for, k = 3, t = 0.3 (below
    // the prefix crossover, so this IS the auto-routed mode):
    //   - docs 0..199: unique 30-token bodies + a SHARED 5-token
    //     footer. The three fully-footer shingles have df = 202 > 64
    //     -> hot, feeding C(202,2) x 3 candidate rows uncapped; the
    //     carriers' hot share is 3/33 < 2t/(1+t) = 0.46 (not risky)
    //     and their pairwise J = 3/63 < t — dropping them from
    //     generation loses nothing (the soundness bound at work).
    //   - docs 300/301: SHORT footer-dominated docs (hot share 3/5 >=
    //     0.46 -> risky) whose mutual J = 3/7 ~ 0.43 >= t through hot
    //     shingles ONLY — they exist in the output IFF the risky
    //     residual works.
    //   - docs 400/401: a cold near-identical pair (low-df shingles)
    //     caught by the capped self-join.
    val footer = (1 to 5).map(i => s"f$i").mkString(" ")
    val fixture =
      (0L until 200L).map(i =>
        (i, (1 to 30).map(j => s"a${i}_$j").mkString(" ") + " " + footer)) ++
      Seq(
        (300L, s"s1 s2 $footer"),
        (301L, s"t1 t2 $footer"),
        (400L, (1 to 20).map(j => s"c$j").mkString(" ")),
        (401L, (1 to 19).map(j => s"c$j").mkString(" ") + " CHANGED"))
    val idx = TextDedup.buildIndex(
      fixture.toDF("doc_id", "text"), "doc_id", "text", n = 3)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    val cappedDf = TextDedup.ngramJaccardDirect(idx, 0.3, maxDf = 64)
    assert(TextDedup.lastDirectCapped,
      "sporadic-hot fixture must ROUTE to the capped drop-and-verify plan")
    val capped = rows(cappedDf)
    val uncapped = rows(TextDedup.ngramJaccardDirect(idx, 0.3, Int.MaxValue))
    assert(capped === uncapped,
      "the df cap must be drop-and-VERIFY exact, never lossy")
    assert(capped.exists(p => p._1 == 300L && p._2 == 301L),
      "the risky pair shares ONLY hot shingles — the residual must recover it")
    assert(capped.exists(p => p._1 == 400L && p._2 == 401L),
      "cold near-dup pair must arrive through the capped self-join")
    assert(!capped.exists(p => p._1 < 200L && p._2 < 200L),
      "footer carriers sit below the threshold — dropping their hot " +
        "candidates must lose nothing")
    // A dup-DENSE corpus (qualifying hot mass everywhere) must route
    // back to the one-pass count — the measured 830s-vs-26s lesson.
    val dense = (0L until 120L).map(i =>
      (i, (1 to 12).map(j => s"d$j").mkString(" ") + s" x$i"))
    val idxDense = TextDedup.buildIndex(
      dense.toDF("doc_id", "text"), "doc_id", "text", n = 3)
    val denseOut = rows(TextDedup.ngramJaccardDirect(idxDense, 0.3, maxDf = 64))
    assert(!TextDedup.lastDirectCapped,
      "a dup-dense corpus must route to the one-pass plan")
    assert(denseOut ===
      rows(TextDedup.ngramJaccardDirect(idxDense, 0.3, Int.MaxValue)))
  }

  test("minhashLshPairs recovers exact duplicates with jaccard 1.0") {
    val txt = (1 to 40).map(i => s"t$i").mkString(" ")
    val other = (1 to 40).map(i => s"u$i").mkString(" ")
    val out = TextDedup.minhashLshPairs(
      docs((1L, txt), (2L, txt), (3L, other)),
      "doc_id", "text", n = 3, threshold = 0.9)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("LSH candidate pairs verified-subset of exact ngram pairs") {
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val d = docs(
      (1L, base),
      (2L, base.replace("w25", "XX")),
      (3L, base.replace("w10", "YY").replace("w40", "ZZ")),
      (4L, (200 to 250).map(i => s"q$i").mkString(" ")))
    val exact = TextDedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val lsh = TextDedup.minhashLshPairs(d, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH survivors must be true near-dups")
    assert(lsh.nonEmpty, "32x16 banding should catch 0.8+ similarity pairs")
  }

  test("shingle index lifecycle is caller-owned: persist then unpersist") {
    import org.apache.spark.storage.StorageLevel
    val idx = TextDedup.buildIndex(
      docs((1L, "a b c d e"), (2L, "a b c d f")), "doc_id", "text", n = 3)
    assert(idx.df.storageLevel == StorageLevel.NONE, "built unpersisted")
    idx.persist()
    idx.df.count() // materialize the cache
    assert(idx.df.storageLevel != StorageLevel.NONE, "persist() caches")
    idx.unpersist(blocking = true)
    assert(idx.df.storageLevel == StorageLevel.NONE, "unpersist() releases")
  }

  test("one 32-bit index serves both exact-Jaccard and MinHash pipelines") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = docs((1L, base), (2L, base.replace("w20", "XX")),
      (3L, (100 to 140).map(i => s"v$i").mkString(" ")))
    val idx = TextDedup.buildIndex(d, "doc_id", "text", n = 3, bits = 32).persist()
    try {
      val exact = TextDedup.ngramJaccardPairs(idx, 0.5)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val lsh = TextDedup.minhashLshPairs(idx, 0.5, numHashes = 32, bands = 16)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(exact == Set((1L, 2L)))
      assert(lsh.subsetOf(exact))
    } finally idx.unpersist()
  }

  test("prefix filtering prunes hot-shingle candidates but stays exact") {
    // Every doc shares one stopword-like tail shingle; uniques otherwise.
    // At threshold 0.5 the hot shingle (max df) sorts to the tail of the
    // canonical order and falls outside every prefix, so candidate
    // generation collapses from C(n,2) co-occurring pairs to zero.
    val n = 20
    val d = docs((1 to n).map(i =>
      (i.toLong, s"u${i}a u${i}b u${i}c common tail words")): _*)
    val idx = TextDedup.buildIndex(d, "doc_id", "text", n = 3).persist()
    try {
      val naiveCooccur = idx.df.as("a")
        .join(idx.df.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .select("a.doc_id", "b.doc_id").distinct().count()
      val pruned = TextDedup.prefixCandidates(idx.df, 0.5).count()
      assert(naiveCooccur == n.toLong * (n - 1) / 2,
        "hot shingle makes every pair co-occur")
      assert(pruned == 0, s"prefix filter must drop hot-shingle-only pairs, got $pruned")
      assert(TextDedup.ngramJaccardPairs(idx, 0.5).count() == 0,
        "no true pair reaches the threshold")
    } finally idx.unpersist()
  }

  test("simhashPairs: identical docs at hamming 0; byte-banding finds them") {
    val txt = (1 to 30).map(i => s"s$i").mkString(" ")
    val out = TextDedup.simhashPairs(
      docs((1L, txt), (2L, txt), (3L, "completely different words here entirely")),
      "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 2L, 0)))
  }

  test("quality score components and band membership") {
    val good = (1 to 30).map(i => s"word$i").mkString(" ") + " the and of"
    val row = TextAnalysis.qualityScore(docs((1L, good)), "doc_id", "text").head()
    assert(row.getAs[Int]("n_tokens") == 33)
    assert(row.getAs[Double]("quality_score") == 1.0)
    val bad = TextAnalysis.qualityScore(docs((2L, "x z x z x z")), "doc_id", "text").head()
    assert(bad.getAs[Double]("quality_score") < 0.5)
  }

  test("language id picks the max-hit language, und on no evidence") {
    val d = docs(
      (1L, "the cat and the dog of a house"),
      (2L, "el perro de la casa y que"),
      (3L, "zzz qqq www"))
    val out = TextAnalysis.languageId(d, "doc_id", "text")
      .orderBy("doc_id").select("detected_lang").as[String].collect()
    assert(out.toSeq == Seq("en", "es", "und"))
  }

  test("fingerprints are stable and edit-robust on the min-shingle hash") {
    val t = "abcdefghijklmnopqrstuvwxyz0123456789"
    val out = TextAnalysis.fingerprints(
      docs((1L, t), (2L, t), (3L, t + "!")), "doc_id", "text")
      .orderBy("doc_id")
      .select("md5_hash", "min_shingle_hash").as[(String, String)].collect()
    assert(out(0) == out(1))
    assert(out(0)._1 != out(2)._1, "md5 must differ on any edit")
    assert(out(0)._2 == out(2)._2,
      "1-hash MinHash usually survives a suffix edit (deterministic here)")
  }

  test("token counts: ws vs bpe-ish vs distinct") {
    val row = TextAnalysis.tokenCounts(
      docs((1L, "ab ab 12 c-d")), "doc_id", "text").head()
    assert(row.getAs[Int]("n_ws_tokens") == 4)
    // ab, ab, 1, 2, c, -, d
    assert(row.getAs[Int]("n_bpe_tokens") == 7)
    assert(row.getAs[Int]("n_distinct_tokens") == 3)
  }

  test("redact replaces emails and urls with tokens and counts matches") {
    val row = TextAnalysis.redact(
      docs((1L, "mail a.b+c@test.org or see https://ex.com/x?q=1 and http://y.io now")),
      "doc_id", "text").head()
    assert(row.getAs[String]("clean_text") ==
      "mail <EMAIL> or see <URL> and <URL> now")
    assert(row.getAs[Int]("n_emails") == 1)
    assert(row.getAs[Int]("n_urls") == 2)
  }

  test("repetition ratio: looped text high, unique text zero, tiny docs zero") {
    val out = TextAnalysis.repetition(
      docs(
        (1L, "a b c a b c a b c"), // 7 positions, 3 distinct rolls
        (2L, "one two three four"), // all distinct
        (3L, "hi")), // < n tokens -> single-shingle fallback
      "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .select("n_shingle_positions", "n_distinct_shingles", "repetition_ratio")
      .as[(Int, Int, Double)].collect()
    assert(out(0) == ((7, 3, math.rint((1.0 - 3.0 / 7) * 1e6) / 1e6)))
    assert(out(1) == ((2, 2, 0.0)))
    assert(out(2) == ((1, 1, 0.0)))
  }

  test("dedupSurvivors keeps the highest-quality member, ties to min doc id") {
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // cluster 1
      (10L, 10L), (11L, 10L)) // cluster 10
      .toDF("doc_id", "canonical_id")
    val quality = Seq(
      (1L, 0.25), (2L, 0.75), (3L, 0.75), // tie at 0.75 -> doc 2 wins
      (10L, 0.5), (11L, 0.25))
      .toDF("doc_id", "quality_score")
    val out = TextDedup.dedupSurvivors(clusters, quality, "quality_score")
      .as[(Long, Long, Double, Long)].collect()
      .map { case (c, s, q, n) => c -> ((s, q, n)) }.toMap
    assert(out == Map(
      1L -> ((2L, 0.75, 3L)),
      10L -> ((10L, 0.5, 2L))))
  }

  test("ngramLmScore ranks fluent repetition above shuffled gibberish") {
    import graft.operators.TextAnalysis
    // Corpus dominated by one phrase: its bigrams are high-count, so a
    // doc repeating them scores higher than one with the same words in
    // an order never seen in training.
    val corpus = docs(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat"),
      (4L, "mat the on sat cat the"))
    val out = TextAnalysis.ngramLmScore(corpus, corpus, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, lp) => id -> ((n, lp)) }.toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L)._1 == 5L, "6 tokens -> 5 bigram positions")
    assert(out(1L) == out(2L) && out(2L) == out(3L), "identical docs score identically")
    assert(out(1L)._2 > out(4L)._2, "unseen bigram order must score lower")
    // Trigram order: same ranking property, 4 positions per doc.
    val tri = TextAnalysis.ngramLmScore(corpus, corpus, "doc_id", "text", n = 3)
      .as[(Long, Long, Double)].collect()
      .map { case (id, c, lp) => id -> ((c, lp)) }.toMap
    assert(tri(1L)._1 == 4L && tri(1L)._2 > tri(4L)._2)
  }

  test("qualitySignals: the fused scan equals each standalone operator") {
    import graft.operators.TextAnalysis
    val five = "the cat sat on the mat and that have with"
    // No empty doc here: the STANDALONE q17 reference divides by the
    // token count unguarded (matches the oracle; the fixture corpus
    // has no empty docs) — empty-doc behavior of the kernels is
    // pinned in their own specs.
    val corpus = docs(
      (1L, five + " " + five + " extra words here now"),
      (2L, "aaa aaa aaa aaa"),
      (3L, "tiny doc"),
      (4L, "der die und das ist gut"))
    val fused = TextAnalysis.qualitySignals(corpus, "doc_id", "text")
      .as[(Long, Int, Double, String, Option[Double], Option[Double], Int)]
      .collect().map(r => r._1 -> r).toMap
    val q = TextAnalysis.qualityScore(corpus, "doc_id", "text")
      .select($"doc_id", $"quality_score").as[(Long, Double)].collect().toMap
    val lg = TextAnalysis.languageId(corpus, "doc_id", "text")
      .select($"doc_id", $"detected_lang").as[(Long, String)].collect().toMap
    val rep = TextAnalysis.repetition(corpus, "doc_id", "text")
      .select($"doc_id", $"repetition_ratio")
      .as[(Long, Option[Double])].collect().toMap
    val ent = TextAnalysis.charEntropyProfile(corpus, "doc_id", "text")
      .select($"doc_id", $"char_entropy")
      .as[(Long, Option[Double])].collect().toMap
    val gp = TextAnalysis.gopherRules(corpus, "doc_id", "text")
      .select($"doc_id", $"pass").as[(Long, Boolean)].collect().toMap
    corpus.select($"doc_id").as[Long].collect().foreach { id =>
      val f = fused(id)
      assert(f._3 == q(id), s"quality_score doc $id")
      assert(f._4 == lg(id), s"detected_lang doc $id")
      assert(f._5 == rep(id), s"repetition_ratio doc $id")
      assert(f._6 == ent(id), s"char_entropy doc $id")
      assert(f._7 == (if (gp(id)) 1 else 0), s"gopher_pass doc $id")
    }
  }

  test("stupidBackoffScore: all three backoff levels hand-computed") {
    import graft.operators.TextAnalysis
    // Train "a b c a b c": c123("a b c")=2; c12("a b")=c12("b c")=2,
    // c12("c a")=1; c1(a)=c1(b)=c1(c)=2, N=6, V=3.
    val train = docs((1L, "a b c a b c"))
    val scored = docs(
      (10L, "a b c"), // seen trigram: p = 2/2 = 1
      (11L, "x b c"), // bigram backoff: p = 0.4 * (2/2)
      (12L, "a b a"), // unigram floor, seen w3: 0.4 * (0.4 * (3/9))
      (13L, "b c d")) // unigram floor, unseen w3: 0.4 * (0.4 * (1/9))
    val out = TextAnalysis.stupidBackoffScore(train, scored, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def r8(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    def exp1(p: Double) = BigDecimal(r8(math.log(p)).toDouble / 1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(10L) == ((1L, exp1(1.0))))
    assert(out(11L) == ((1L, exp1(0.4 * (2.0 / 2)))))
    assert(out(12L) == ((1L, exp1(0.4 * (0.4 * (3.0 / 9))))))
    assert(out(13L) == ((1L, exp1(0.4 * (0.4 * (1.0 / 9))))))
  }

  test("tokenRuns: longest run, tie to earliest, loop flag, empty doc") {
    import graft.operators.TextAnalysis
    val corpus = docs(
      (1L, "a a a b b c"),
      (2L, "x x x x x y"),
      (3L, "a a b b"), // tie: earliest run wins
      (4L, ""))
    val out = TextAnalysis.tokenRuns(corpus, "doc_id", "text")
      .as[(Long, Int, Int, String, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((6, 3, "a", 0)))
    assert(out(2L) == ((6, 5, "x", 1)), "run of 5 trips the loop flag")
    assert(out(3L) == ((4, 2, "a", 0)), "equal-length runs: earliest token")
    assert(out(4L) == ((0, 0, "", 0)), "empty doc: zero-run row, not missing")
  }

  test("charEntropy kernel: hand-computed values, empty-doc null") {
    import graft.operators.TextAnalysis
    val corpus = docs((1L, "aaaa"), (2L, "ab"), (3L, "abcd"),
      (4L, "aab"), (5L, ""))
    val out = TextAnalysis.charEntropyProfile(corpus, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((4L, Some(0.0))), "uniform single char: zero entropy")
    assert(out(2L) == ((2L, Some(1.0))), "two equiprobable chars: 1 bit")
    assert(out(3L) == ((4L, Some(2.0))), "four equiprobable chars: 2 bits")
    assert(out(5L) == ((0L, None)), "empty doc is null, not NaN")
    // "aab": -(2/3 log2 2/3) - (1/3 log2 1/3), through the kernel's
    // 8dp-term / integer-6dp-round discipline.
    def term(p: Double) = BigDecimal(-(p * (math.log(p) / math.log(2.0))))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact
    val exp = ((term(2.0 / 3) + term(1.0 / 3) + 50L) / 100L).toDouble / 1e6
    assert(out(4L) == ((3L, Some(exp))))
    assert(exp > 0.918 && exp < 0.919)
  }

  test("charEntropy counts CODE POINTS on non-BMP text (VERDICT r07 item 8)") {
    import graft.operators.TextAnalysis
    // Astral chars are ONE code point (a surrogate pair in UTF-16);
    // combining marks are their OWN code points (unlike grapheme
    // splitting, which fuses them) — both pinned here, matching the
    // q127 oracle's regexp code-point split.
    val grin = new String(Character.toChars(0x1F600))
    val party = new String(Character.toChars(0x1F389))
    val corpus = docs(
      (1L, grin + grin + party), // {2/3, 1/3} over 3 code points
      (2L, "e\u0301"),      // base + combining acute: 2 code points, 1 bit
      (3L, grin))                // single astral char: 1 code point, 0 bits
    val out = TextAnalysis.charEntropyProfile(corpus, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def term(p: Double) = BigDecimal(-(p * (math.log(p) / math.log(2.0))))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact
    val exp = ((term(2.0 / 3) + term(1.0 / 3) + 50L) / 100L).toDouble / 1e6
    assert(out(1L) == ((3L, Some(exp))), "two-grin-one-party = the aab distribution")
    assert(out(2L) == ((2L, Some(1.0))), "combining sequence is TWO equiprobable code points")
    assert(out(3L) == ((1L, Some(0.0))), "astral char is ONE code point")
  }

  test("c4LineFilter: line rules, doc gates, ordered reassembly") {
    import graft.operators.TextAnalysis
    val five = "one two three four five"
    val corpus = Seq(
      // 4 lines: 3 keepable + 1 too-short -> kept doc
      (1L, s"$five.\n$five!\nshort line.\n$five?"),
      // enough words but no terminal punctuation -> dropped lines
      (2L, s"$five\n$five\n$five"),
      // page-level gates: brace and lorem ipsum kill otherwise-good docs
      (3L, s"$five.\n$five.\n$five {.\n$five."),
      (4L, s"$five.\n$five.\nLorem Ipsum dolor sit amet.\n$five."),
      (5L, "")) // empty doc: one empty line, nothing kept
      .toDF("doc_id", "text")
    val out = TextAnalysis.c4LineFilter(corpus, "doc_id", "text")
      .as[(Long, Long, Long, String, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((4L, 3L, s"$five.\n$five!\n$five?", 1)),
      "3 of 4 lines survive in order; doc kept")
    assert(out(2L) == ((3L, 0L, "", 0)), "no terminal punctuation -> all dropped")
    assert(out(3L)._4 == 0 && out(3L)._2 >= 3L, "curly brace kills the page")
    assert(out(4L)._4 == 0, "lorem ipsum kills the page (case-insensitive)")
    assert(out(5L) == ((1L, 0L, "", 0)), "empty doc: one line, nothing kept")
  }

  test("knScore: interpolated Kneser–Ney matches hand-computed probabilities") {
    import graft.operators.TextAnalysis
    // Train counts: c12("a b")=1, c12("b a")=2, c12("a c")=1;
    // hc(a)=2, hc(b)=2; N1+(a,.)=2, N1+(b,.)=1;
    // N1+(.,b)=1, N1+(.,a)=1, N1+(.,c)=1; D=3 distinct bigrams, V=3.
    val train = docs((1L, "a b a c"), (2L, "b a"))
    val scored = docs((10L, "a b a d d a"))
    val out = TextAnalysis.knScore(train, scored, "doc_id", "text")
      .as[(Long, Long, Double)].head()
    def r8(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    // "a b" seen:      (1-.75)/2 + (.75*2/2)*((1+1)/6)  = 0.375
    // "b a" seen:      (2-.75)/2 + (.75*1/2)*((1+1)/6)  = 0.75
    // "a d" bkoff-cont: 0/2      + (.75*2/2)*((0+1)/6)  = 0.125
    // "d d" unseen history -> Pcont(d) = (0+1)/6
    // "d a" unseen history -> Pcont(a) = (1+1)/6
    val lps = Seq(0.375, 0.75, 0.125, 1.0 / 6, 2.0 / 6).map(p => r8(math.log(p)))
    val expected = BigDecimal(lps.sum.toDouble / 5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out._1 == 10L && out._2 == 5L)
    assert(out._3 == expected)
    // Ranking property: a doc of high-count training bigrams outscores
    // the same words in never-seen order (the q57 fluency property).
    val corpus = docs(
      (1L, "the cat sat on the mat"), (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat"), (4L, "mat the on sat cat the"))
    val kn = TextAnalysis.knScore(corpus, corpus, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, lp) => id -> ((n, lp)) }.toMap
    assert(kn(1L)._2 > kn(4L)._2, "unseen bigram order must score lower")
  }

  test("knScore: the interpolated model is an EXACT distribution per seen history") {
    import graft.operators.TextAnalysis
    // For any seen history w1, sum over the V train tokens of
    // P(w2|w1) telescopes to exactly 1:
    //   sum max(c12-d,0)/hc = (hc - d*n1p)/hc, and
    //   sum Pcont(w2) = (D + V)/(D + V) = 1, so the backoff mass
    //   d*n1p/hc closes the gap exactly. Verify numerically by
    //   scoring one synthetic doc "<w1> <w2>" per vocab pair.
    val train = docs((1L, "a b a c b a"), (2L, "c c b"))
    val vocab = Seq("a", "b", "c")
    val pairs = (for {
      (w1, i) <- vocab.zipWithIndex
      (w2, j) <- vocab.zipWithIndex
    } yield ((i * vocab.size + j).toLong, s"$w1 $w2")).toDF("doc_id", "text")
    val lp = TextAnalysis.knScore(train, pairs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> math.exp(r._3)).toMap
    vocab.indices.foreach { i =>
      val total = vocab.indices.map(j => lp((i * vocab.size + j).toLong)).sum
      assert(math.abs(total - 1.0) < 1e-6,
        s"P(.|${vocab(i)}) sums to $total, not 1")
    }
  }

  test("containmentPairs flags near-subsets that Jaccard misses") {
    // Doc 1 is exactly the first third of doc 2: containment(1 in 2)=1
    // but Jaccard ~ 1/3. Doc 3 shares nothing.
    val base = "alpha beta gamma delta epsilon zeta"
    val corpus = docs(
      (1L, base),
      (2L, base + " eta theta iota kappa lambda mu nu xi omicron pi rho sigma"),
      (3L, "one two three four five six seven"))
    val idx = TextDedup.buildIndex(corpus, "doc_id", "text", n = 3, bits = 64)
    val out = TextDedup.containmentPairs(idx, threshold = 0.9)
      .as[(Long, Long, Double, Double)].collect()
    assert(out.length == 1)
    val (a, b, ca, cb) = out.head
    assert((a, b) == ((1L, 2L)) && ca == 1.0 && cb < 0.5,
      "short doc fully contained; container side far below threshold")
    // The symmetric Jaccard operator must NOT pair them at the same bar.
    val jac = TextDedup.ngramJaccardPairs(idx, 0.9).collect()
    assert(jac.isEmpty, "Jaccard at 0.9 misses the containment pair")
  }

  test("connectedComponents closes chains transitively with min-id canonicals (both solve paths)") {
    // A~B, B~C (A never matched C directly), plus an isolated pair D~E.
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    val uf = TextDedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(uf == expected)
    // Distributed label propagation (above-threshold path) must agree.
    val dist = TextDedup.connectedComponents(pairs, driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist == expected)
  }

  test("connectedComponents converges on a long chain within maxIters (propagation path)") {
    val chain = (0L until 15L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = TextDedup.connectedComponents(chain, maxIters = 20, driverThreshold = 0L)
      .as[(Long, Long)].collect()
    assert(out.length == 16 && out.forall(_._2 == 0L))
  }

  test("connectedComponentsIncremental equals from-scratch on the union pair graph") {
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (30L, 31L))
      .toDF("doc_a", "doc_b")
    val existing = TextDedup.connectedComponents(oldPairs)
    // New batch: merge clusters {1,2,3} and {10,11} through a NEW doc,
    // a brand-new cluster, and a redundant internal pair.
    val newPairs = Seq(
      (11L, 50L), (50L, 2L), // transitive merge via new doc 50
      (20L, 21L), // new standalone cluster
      (3L, 1L)) // already same cluster -> contracted self-loop
      .toDF("doc_a", "doc_b")
    val inc = TextDedup.connectedComponentsIncremental(existing, newPairs)
      .as[(Long, Long)].collect().toMap
    val scratch = TextDedup.connectedComponents(oldPairs.unionByName(newPairs))
      .as[(Long, Long)].collect().toMap
    assert(inc == scratch, "incremental must equal from-scratch on old+new pairs")
    assert(inc(11L) == 1L && inc(50L) == 1L && inc(20L) == 20L && inc(30L) == 30L)
    // The distributed fallback (contracted graph above the driver
    // threshold) must produce the identical labeling.
    val dist = TextDedup.connectedComponentsIncremental(existing, newPairs,
      driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist == scratch, "distributed propagation path must agree with union-find")
  }

  test("connectedComponentsIncremental with only-internal new pairs is the identity") {
    val oldPairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val existing = TextDedup.connectedComponents(oldPairs)
    val inc = TextDedup.connectedComponentsIncremental(
      existing, Seq((2L, 1L)).toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(inc == Map(1L -> 1L, 2L -> 1L))
  }

  test("bm25 ranks by term frequency, rarity, and length normalization") {
    import graft.operators.TextSearch
    val corpus = docs(
      (1L, "fox fox fox"), // high tf of a rare term, short doc
      (2L, "fox and some other words here to dilute the term frequency a lot " +
        "with plenty of extra filler tokens everywhere"), // same term, long doc
      (3L, "dog dog dog"), // common term (appears in 3 docs)
      (4L, "dog cat"), (5L, "dog bird"),
      (6L, "nothing relevant at all"))
    val out = TextSearch.bm25(corpus, "doc_id", "text",
      queryTerms = Seq("fox", "dog"), topK = 10)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    // fox (df=2) outscores dog (df=3); within fox, short doc 1 beats
    // diluted doc 2; doc 6 matches nothing and is absent.
    assert(out.head == 1L, s"rare-term short doc must rank first: $out")
    assert(out.contains(2L) && out.indexOf(1L) < out.indexOf(2L))
    assert(!out.contains(6L))
    assert(out.size == 5)
  }

  test("contaminated flags only docs sharing an n-gram with the benchmark, with counts") {
    val corpus = docs(
      (1L, "alpha beta gamma delta epsilon"), // shares "alpha beta gamma" + "beta gamma delta"
      (2L, "totally unrelated text goes here"),
      (3L, "x y alpha beta gamma z")) // shares "alpha beta gamma"
    val bench = docs((100L, "alpha beta gamma delta"))
    val out = TextDedup.contaminated(corpus, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 3L -> 1L),
      "doc 1 shares two benchmark 3-grams, doc 3 one, doc 2 none")
  }

  test("minhashEstimatePairs: exact dups estimate 1.0; estimates near exact Jaccard") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val d = docs(
      (1L, base), (2L, base), // exact dup -> est 1.0
      (3L, base + " extra tail token"), // near dup
      (4L, "completely different content with no overlap at all whatsoever here"))
    val idx = TextDedup.buildIndex(d, "doc_id", "text", n = 3, bits = 32)
    val est = TextDedup.minhashEstimatePairs(TextDedup.minhashSignatures(idx, 32), 0.25, 32, 16)
      .select("doc_a", "doc_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(est((1L, 2L)) == 1.0)
    assert(est.contains((1L, 3L)) && est((1L, 3L)) > 0.3 && est((1L, 3L)) < 1.0)
    assert(!est.keys.exists { case (a, b) => b == 4L || a == 4L })
    // Estimator tracks the exact verify: same candidates, correlated values.
    val exact = TextDedup.minhashLshPairs(idx, 0.05, 32, 16)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    est.foreach { case (k, e) =>
      assert(math.abs(e - exact(k)) < 0.35, s"estimate $e far from exact ${exact(k)} for $k")
    }
  }

  test("LM statistics compose additively from batch count slices") {
    // The weekly-cadence pin for LM state: a batch's lmTrain frames
    // are writable slices; union + re-sum must equal training on the
    // concatenated corpus (scoring follows since it is a pure
    // function of the count frames).
    val batchA = Seq((1L, "the cat sat on the mat"),
      (2L, "the dog ran to the cat")).toDF("doc_id", "text")
    val batchB = Seq((3L, "the cat ran and the dog sat"),
      (4L, "a bird flew over the mat")).toDF("doc_id", "text")
    val a = TextAnalysis.lmTrain(batchA, "text")
    val b = TextAnalysis.lmTrain(batchB, "text")
    val composed = TextAnalysis.lmStatsFromCounts(
      a.bgCounts.unionByName(b.bgCounts),
      a.prefixCounts.unionByName(b.prefixCounts))
    val scratch = TextAnalysis.lmTrain(batchA.unionByName(batchB), "text")
    def bg(m: TextAnalysis.LmStats) =
      m.bgCounts.as[(String, Long)].collect().toSet
    def pre(m: TextAnalysis.LmStats) =
      m.prefixCounts.as[(String, Long)].collect().toSet
    def v(m: TextAnalysis.LmStats) = m.vocab.as[Long].collect().head
    assert(bg(composed) == bg(scratch))
    assert(pre(composed) == pre(scratch))
    assert(v(composed) == v(scratch))
    // And per-gram scoring under the composed stats is identical.
    import org.apache.spark.sql.functions.{col, explode}
    import graft.functions.TextFunctions.{tokens, wordNgramsNative}
    val grams = batchA.unionByName(batchB)
      .select(col("doc_id"),
        explode(wordNgramsNative(tokens(col("text")), 2)).as("bg"))
    def lps(m: TextAnalysis.LmStats) =
      TextAnalysis.lmLogProbs(grams, m)
        .select($"doc_id", $"lp").as[(Long, Double)].collect().toSeq.sorted
    assert(lps(composed) == lps(scratch))
  }
}
