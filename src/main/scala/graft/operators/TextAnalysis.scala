package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for training-data curation (LLM-data-pipeline
  * tier): token counting, quality scoring, language ID, fingerprinting.
  *
  * All pure per-row expression pipelines — no shuffle at all; at 100 TB
  * these run as a single map pass fused into the parquet scan by
  * whole-stage codegen.
  */
object TextAnalysis {

  /** Stopword markers per language for the n-gram/stopword heuristic
    * language identifier. Tiny on purpose: the point is the operator
    * shape (per-token set membership + argmax), not lexicon quality. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "un"))

  /** Occurrence count (duplicates included) of `words` in a token
    * array, via the native one-pass codegen'd
    * [[graft.functions.expr.TokenSetCount]]. Both declarative forms
    * measured worse: `size(filter(toks, _.isin(words)))` is an
    * interpreted per-token lambda (CodegenFallback, dominant cost of
    * language-ID/quality scoring), and per-word
    * `size(array_remove(toks, w))` sums allocate |words| full array
    * copies per row (3x regression at 20 stopwords). */
  private def countIn(toks: Column, words: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.TokenSetCount(
      ColumnBridge.expression(toks), words))
  }

  /** Token counts: whitespace tokens plus a BPE-ish regex segmentation
    * (letter runs | digits | single punctuation) — the classic cheap
    * proxy for subword token counts. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      size(toks).as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).as("n_bpe_tokens"),
      size(array_distinct(toks)).as("n_distinct_tokens"))
  }

  /** Heuristic quality score in [0,1]: length band, type-token ratio,
    * mean token length band, stopword presence. Deterministic arithmetic
    * only (no float functions whose rounding could differ per engine). */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val nChars = length(col(textCol)).cast("double")
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val meanTokLen = (nChars - (nTok - 1)) / nTok // single-space joined
    val stopRatio = countIn(toks, langMarkers.flatMap(_._2)).cast("double") / nTok
    // The score column is ONE kernel call, not the when-chain over the
    // ratio subtrees: curation pipelines filter on quality_score, and
    // predicate pushdown would inline the full chain into a FilterExec
    // (no subexpression elimination — the ratios each re-split the
    // text; same lesson as detectedLang, NOTES finding #11). The
    // kernel's arithmetic is bit-identical to the declarative form.
    docs.select(
      col(idCol).as("doc_id"),
      nTok.cast("int").as("n_tokens"),
      round(ttr, 6).as("type_token_ratio"),
      round(meanTokLen, 6).as("mean_token_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      qualityScoreCol(col(textCol)).as("quality_score"))
  }

  /** The quality score as a single codegen'd expression (rounded to
    * 2dp) — safe to inline anywhere (filters, streaming column
    * pipelines) at one kernel call per row; [[qualityScore]]'s score
    * column and every composed consumer share this one definition. */
  def qualityScoreCol(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    round(ColumnBridge.column(graft.functions.expr.QualityScore(
      ColumnBridge.expression(tokens(text)),
      ColumnBridge.expression(length(text)),
      langMarkers.flatMap(_._2))), 2)
  }

  /** Language ID: count marker-word hits per language, pick the argmax
    * (ties and zero evidence -> "und", ISO 639-3 undetermined). The CASE
    * chain encodes a fixed preference order so the pick is deterministic
    * and oracle-reproducible. */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // The pick is ONE kernel call (first declared label wins ties,
    // "und" on zero evidence — ISO 639-3 undetermined), NOT a CASE
    // chain over the count columns: downstream filters on
    // detected_lang get predicate-pushed below this projection, and a
    // substituted CASE chain re-evaluates every count per branch
    // inside FilterExec (which has no subexpression elimination) —
    // measured 17x on the stratified-sample query.
    val toks = tokens(col(textCol))
    docs.select(
      (Seq(col(idCol).as("doc_id")) ++
        langMarkers.map { case (l, ws) => countIn(toks, ws).as(s"hits_$l") } :+
        detectedLang(toks).as("detected_lang")): _*)
  }

  /** The language pick as a single codegen'd expression — safe to
    * inline anywhere (filters, joins) at one kernel call per row. */
  def detectedLang(toks: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.MarkerArgmax(
      ColumnBridge.expression(toks), langMarkers, "und"))
  }

  /** PII/URL redaction (C4-style curation pass): emails then URLs
    * replaced with fixed tokens, with per-doc match counts for audit.
    * Patterns stay in the regex subset shared by Java regex and RE2 so
    * the operator is engine-portable (and DuckDB-oracle-checkable).
    * Pure map pass — fused into the scan by codegen at any scale. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"

  /** The redaction rewrite as a column — [[redact]] and the streaming
    * pipeline share this one definition of the replacement recipe. */
  def redactedText(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      UrlPattern, "<URL>")

  def redact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      redactedText(col(textCol)).as("clean_text"),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
        .as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(UrlPattern), lit(0)))
        .as("n_urls"))

  /** Extended PII surface (q140): IPv4 literals and phone-like digit
    * runs beside the email/URL pair. Both patterns stay inside the
    * RE2-compatible subset (character classes + bounded repetition,
    * `\b` word boundaries; no lookaround, no backreferences) so the
    * DuckDB oracle replays them verbatim — the [[HtmlDropTags]]
    * parity rule.
    *
    * The phone pattern is deliberately CONSERVATIVE-SHAPED (an
    * optional +, 8+ of digits/separators, digit ends): real PII
    * scrubbing tunes precision/recall per corpus; what the engine
    * owes is a deterministic, engine-portable rewrite, counted on the
    * RAW text per pattern independently (the q42 discipline — an
    * email inside a URL counts in both tallies). */
  val Ipv4Pattern =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  // No '.' in the separator class: dotted digit runs are the IPv4
  // pattern's territory — including it would double-count every IP
  // as a phone in the raw-text tallies.
  // DIGIT count, not character count (ADVICE r07): >= 9 digits with
  // optional ()/-/space separators between. The old 8+-CHARACTER form
  // ate any dash/space-separated digit run — ISO dates (2024-01-01)
  // and short numeric table rows rewrote to <PHONE>. Nine digits
  // clears an 8-digit date while keeping every real phone shape
  // (10-15 digits with or without +CC). Residue, documented in the
  // fixture: ADJACENT dates/number runs whose combined digits reach 9
  // (e.g. "2024-01-01 2024-01-02") still redact as one run — the
  // conservative-shaped contract trades that precision for
  // determinism and engine portability.
  val PhonePattern = "\\+?(?:[0-9][()\\- ]*){8,}[0-9]"

  /** The extended rewrite: email -> URL -> IPv4 -> phone, in that
    * order (IPs redact before the phone pass so dotted quads never
    * feed the digit-run pattern). */
  def redactedPiiText(text: Column): Column =
    regexp_replace(regexp_replace(redactedText(text),
      Ipv4Pattern, "<IP>"), PhonePattern, "<PHONE>")

  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      redactedPiiText(col(textCol)).as("clean_text"),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
        .as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(UrlPattern), lit(0)))
        .as("n_urls"),
      size(regexp_extract_all(col(textCol), lit(Ipv4Pattern), lit(0)))
        .as("n_ips"),
      size(regexp_extract_all(col(textCol), lit(PhonePattern), lit(0)))
        .as("n_phones"))

  /** Tag blocks whose CONTENT is boilerplate, dropped wholesale.
    * One pattern per tag (RE2 has no backreferences, so a combined
    * `<(a|b)>.*?</\1>` form would break DuckDB-oracle parity). */
  val HtmlDropTags: Seq[String] = Seq("head", "script", "style", "nav", "footer", "aside")

  /** HTML → text extraction as a column (the crawl-pipeline extract
    * step, a simplified Trafilatura-style rule set): boilerplate
    * blocks dropped wholesale, remaining tags stripped to spaces,
    * the common entities decoded (`&amp;` LAST, the standard order —
    * `&amp;lt;` must yield the literal `&lt;`), whitespace collapsed.
    * Pure codegen string work: lazy `(?s).*?` block matches, no
    * backreferences, no UDF — runs at scan speed. */
  def htmlExtractedText(html: Column): Column = {
    val noBlocks = HtmlDropTags.foldLeft(html) { (c, t) =>
      regexp_replace(c, s"(?s)<$t[^>]*>.*?</$t>", " ")
    }
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }

  /** HTML extraction over a corpus: (doc_id, clean_text, n_chars). */
  def htmlExtract(docs: DataFrame, idCol: String, htmlCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      htmlExtractedText(col(htmlCol)).as("clean_text"))
      .withColumn("n_chars", length(col("clean_text")))

  /** Text canonicalization for dedup/exactness boundaries: Unicode NFC
    * (native codegen'd expression — Spark has no builtin), lowercase,
    * whitespace runs collapsed to single spaces, trimmed. The standard
    * normalization applied before exact-hash dedup so that byte-level
    * encoding variants (composed vs decomposed accents, case, ASCII
    * whitespace runs) collapse to one canonical form. */
  def normalize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val nfc = ColumnBridge.column(graft.functions.expr.NfcNormalize(
      ColumnBridge.expression(col(textCol))))
    docs.select(
      col(idCol).as("doc_id"),
      trim(regexp_replace(lower(nfc), "\\s+", " ")).as("norm_text"))
  }

  /** Gopher-style repetition signal: the share of duplicate word
    * 3-gram positions in the document. `total` counts shingle
    * POSITIONS (tokens - n + 1, min 1 — same tiny-doc fallback as the
    * shingle index); `distinct` reuses the native [[graft.functions.expr.WordShingles]]
    * kernel. High ratio = boilerplate/looped text, the standard
    * pretraining quality filter. */
  def repetition(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val toks = tokens(col(textCol))
    val total = greatest(size(toks) - lit(n - 1), lit(1))
    val distinct = size(wordShinglesNative(toks, n))
    // The ratio is ONE kernel call (rounding included), not the
    // distinct/total arithmetic tree: curation filters on
    // repetition_ratio, and pushdown would inline a tree referencing
    // the tokenization twice into FilterExec (no subexpression
    // elimination — NOTES finding #11). Values are bit-identical.
    docs.select(
      col(idCol).as("doc_id"),
      total.as("n_shingle_positions"),
      distinct.as("n_distinct_shingles"),
      repetitionRatioNative(toks, n).as("repetition_ratio"))
  }

  /** Bigram-LM fluency score (KenLM-lite curation signal): train
    * add-one-smoothed bigram statistics on `train`, score each doc in
    * `docs` by its mean bigram log-probability
    * `avg(ln((c(w1 w2) + 1) / (c(w1) + V)))` — low scores flag
    * gibberish / shuffled / non-prose text that length and stopword
    * heuristics miss; self-scoring the corpus (train = docs) is the
    * standard outlier sweep.
    *
    * Scale shape: counts are map-side-combined groupBys over an
    * explode of the native all-positions [[graft.functions.expr.WordNgrams]]
    * kernel (no self-join to form bigrams); scoring joins each doc
    * bigram to the two count tables by key (AQE decides broadcasts —
    * the bigram table grows with corpus vocabulary, so nothing is
    * pinned). Cross-engine determinism: ln rounded to 8dp per bigram,
    * mean rounded to 6dp (the q51 BM25 discipline). */
  def ngramLmScore(train: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, n: Int = 2): DataFrame =
    lmScoreDocs(lmDocGrams(docs, idCol, textCol, n), lmTrain(train, textCol, n))

  /** The per-doc gram explode of [[ngramLmScore]]'s scoring side —
    * shared with the weekly count-state family
    * ([[graft.pipeline.LmState]]) so both paths explode the SAME
    * expression. */
  private[graft] def lmDocGrams(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(wordNgramsNative(tokens(col(textCol)), n)).as("bg"))

  /** The per-doc aggregation tail of [[ngramLmScore]], shared verbatim
    * with [[graft.pipeline.LmState.serve]] so composed-state scoring is
    * bit-equal by construction. */
  private[graft] def lmScoreDocs(grams: DataFrame, m: LmStats): DataFrame =
    lmLogProbs(grams, m)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        // Sum the 8dp-rounded log-probs in DECIMAL, not double: a
        // double sum over hundreds of summands is order-dependent in
        // its last ulps, and a doc whose mean sits on a 6dp rounding
        // boundary then flips with Spark's aggregation order (caught
        // by the sf0.1 oracle on exactly one doc — NOTES finding #18).
        // The decimal sum is exact, hence order- and engine-invariant.
        round(sum(col("lp").cast("decimal(20,8)")).cast("double") /
          count(lit(1)), 6).as("avg_logprob"))

  /** Batch-trained n-gram LM statistics as COUNT FRAMES (never driver
    * data — the vocabulary scales with the corpus). The caller owns the
    * cache lifecycle, like [[graft.operators.TextDedup.buildIndex]]:
    * persist before reuse across scoring calls (or across micro-batches
    * of the streaming twin, [[graft.streaming.StreamLmScore]]),
    * unpersist when done. */
  final case class LmStats(bgCounts: DataFrame, prefixCounts: DataFrame,
      vocab: DataFrame, n: Int) {
    def persist(): this.type = {
      bgCounts.persist(); prefixCounts.persist(); vocab.persist(); this
    }
    def unpersist(blocking: Boolean = false): this.type = {
      bgCounts.unpersist(blocking); prefixCounts.unpersist(blocking)
      vocab.unpersist(blocking); this
    }
  }

  /** Train the [[ngramLmScore]] statistics: n-gram counts, history
    * ((n-1)-gram) counts, and the 1-row smoothing vocabulary size. */
  def lmTrain(train: DataFrame, textCol: String, n: Int = 2): LmStats = {
    require(n >= 2, s"LM order must be >= 2, got $n")
    val bgCounts = train
      .select(explode(wordNgramsNative(tokens(col(textCol)), n)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    // History counts: (n-1)-gram occurrences at every position. For
    // n=2 that is the plain token stream (kept as explode(tokens) so
    // the q57 oracle mirror stays textually simple).
    val prefixCounts = (if (n == 2)
      train.select(explode(tokens(col(textCol))).as("w"))
    else
      train.select(explode(wordNgramsNative(tokens(col(textCol)), n - 1)).as("w")))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    // Smoothing vocabulary = distinct histories (distinct tokens at n=2).
    val vocab = prefixCounts.agg(count(lit(1)).as("v"))
    LmStats(bgCounts, prefixCounts, vocab, n)
  }

  /** LM statistics from composed count slices — the weekly-cadence
    * entry point: n-gram and history counts are ADDITIVE, so each
    * batch's [[lmTrain]] frames are writable state slices and the
    * corpus statistics come from union + re-sum (the smoothing
    * vocabulary is the distinct-history count of the MERGED frame).
    * Spec-pinned equal to [[lmTrain]] over the concatenated batches;
    * the same append-structured shape as the curation cadence's
    * index/signature slices. */
  def lmStatsFromCounts(bgSlices: DataFrame, prefixSlices: DataFrame,
      n: Int = 2): LmStats = {
    val bg = bgSlices.groupBy(col("bg")).agg(sum(col("c12")).as("c12"))
    val pre = prefixSlices.groupBy(col("w")).agg(sum(col("c1")).as("c1"))
    LmStats(bg, pre, pre.agg(count(lit(1)).as("v")), n)
  }

  /** Per-n-gram smoothed log-probs for a pre-exploded frame with a `bg`
    * column: left joins against the count frames (unseen grams fall to
    * add-one smoothing), the 1-row vocab joined on a literal key with a
    * broadcast hint — value-identical to a cross join, but legal when
    * the gram side is a STREAM (Structured Streaming rejects
    * stream-static cross joins; a broadcast equi-join it supports).
    * Keeps every input column and appends `lp`. */
  private[graft] def lmLogProbs(grams: DataFrame, m: LmStats): DataFrame =
    grams
      .withColumn("w1", substring_index(col("bg"), " ", m.n - 1))
      .withColumn("__vk", lit(1))
      .join(m.bgCounts, Seq("bg"), "left")
      .join(m.prefixCounts.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .join(broadcast(m.vocab.withColumn("__vk", lit(1))), Seq("__vk"))
      .withColumn("lp",
        round(log((coalesce(col("c12"), lit(0L)) + lit(1)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")), 8))
      .drop("bg", "w1", "__vk", "c12", "c1", "v")

  /** C4-style line-level cleaning (public technique: Raffel et al.
    * 2020 §2.2 — the C4 heuristics): keep only LINES with at least
    * `minWords` words that end in a terminal punctuation mark
    * (./!/?), then keep only DOCUMENTS with at least `minLines`
    * surviving lines, no curly brace, and no "lorem ipsum" — the
    * line-granular boilerplate cut that whole-document gates
    * ([[gopherRules]]) cannot express. Output: per-doc line census
    * (n_lines, n_kept), the cleaned re-joined text, and the doc keep
    * flag.
    *
    * Relational shape (the Generate-inlining rule): lines explode to
    * rows, every per-line predicate is a codegen'd scalar, and the
    * re-assembly is one groupBy with an order-pinned array_sort over
    * (pos, line) structs — no interpreted per-element lambdas, no
    * window. One explode + one doc-keyed aggregation at any scale. */
  def c4LineFilter(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5, minLines: Int = 3): DataFrame = {
    val perLine = docs.select(
      col(idCol).as("doc_id"),
      (col(textCol).contains("{") ||
        lower(col(textCol)).contains("lorem ipsum")).as("page_flag"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("keep_line",
        size(tokens(col("line"))) >= minWords &&
          substring(col("line"), -1, 1).isin(".", "!", "?"))
    perLine.groupBy(col("doc_id"), col("page_flag"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("keep_line").cast("long")).as("n_kept"),
        array_sort(collect_list(
          when(col("keep_line"), struct(col("pos"), col("line"))))).as("kept"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        array_join(col("kept.line"), "\n").as("cleaned_text"),
        (col("n_kept") >= minLines && !col("page_flag")).cast("int").as("keep"))
  }

  /** Interpolated Kneser–Ney bigram statistics (public technique:
    * Kneser & Ney 1995; the smoothing family behind KenLM and hence
    * CCNet's quality LM — [[ngramLmScore]]'s add-one is the simple
    * baseline, this is the one production perplexity filters use).
    * Count frames, never driver data, same caller-owned lifecycle as
    * [[LmStats]]:
    *   - `bgCounts`  (bg, c12): bigram occurrence counts
    *   - `hCounts`   (w1, hc):  history mass = Σ_w2 c(w1 w2)
    *   - `fwCounts`  (w1, n1p): distinct continuations of w1 (N1+(w1,·))
    *   - `contCounts`(w2, ncont): distinct histories of w2 (N1+(·,w2))
    *   - `totals` 1 row (dd, v): distinct bigrams, distinct tokens
    */
  final case class KnStats(bgCounts: DataFrame, hCounts: DataFrame,
      fwCounts: DataFrame, contCounts: DataFrame, totals: DataFrame) {
    def persist(): this.type = {
      bgCounts.persist(); hCounts.persist(); fwCounts.persist()
      contCounts.persist(); totals.persist(); this
    }
    def unpersist(blocking: Boolean = false): this.type = {
      bgCounts.unpersist(blocking); hCounts.unpersist(blocking)
      fwCounts.unpersist(blocking); contCounts.unpersist(blocking)
      totals.unpersist(blocking); this
    }
  }

  /** Bigram frame with split history/continuation words — one gram
    * scan feeding all four KN count aggregates.
    *
    * Docs with < 2 tokens are EXCLUDED (ADVICE r06):
    * `wordNgramsNative`'s whole-text fallback would otherwise inject a
    * degenerate "bigram" with w1 == w2 (or "") into the pair counts —
    * a frequent one-token doc could clear a collocation support
    * threshold and surface with inflated PMI. A doc with no adjacent
    * word pair contributes no pair statistics, period. */
  private def knBigrams(df: DataFrame, textCol: String): DataFrame =
    df.where(size(tokens(col(textCol))) >= 2)
      .select(explode(wordNgramsNative(tokens(col(textCol)), 2)).as("bg"))
      .select(col("bg"),
        substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))

  /** Train the Kneser–Ney count frames: four map-side-combined
    * groupBys over ONE bigram scan shape (Catalyst reuses the scan;
    * each aggregate shuffles only its distinct keys — vocabulary-, not
    * corpus-sized). */
  def knTrain(train: DataFrame, textCol: String): KnStats = {
    val bg = knBigrams(train, textCol)
    val db = bg.distinct()
    KnStats(
      bgCounts = bg.groupBy(col("bg")).agg(count(lit(1)).as("c12")),
      hCounts = bg.groupBy(col("w1")).agg(count(lit(1)).as("hc")),
      fwCounts = db.groupBy(col("w1")).agg(count(lit(1)).as("n1p")),
      contCounts = db.groupBy(col("w2")).agg(count(lit(1)).as("ncont")),
      totals = db.agg(count(lit(1)).as("dd")).crossJoin(
        train.select(explode(tokens(col(textCol))).as("w"))
          .agg(count_distinct(col("w")).as("v"))))
  }

  /** Per-document interpolated-KN score over a trained model. Per
    * bigram, with fixed discount d = 0.75 (exactly representable —
    * dyadic):
    *
    *   Pcont(w2) = (N1+(·,w2) + 1) / (D + V)           (add-one floor
    *     so unseen continuations keep P > 0 — the unk bucket)
    *   seen history w1:
    *     P = max(c(w1w2) − d, 0)/hc + ((d·N1+(w1,·))/hc) · Pcont(w2)
    *   unseen history: P = Pcont(w2)                    (pure backoff)
    *
    * Engine-exactness: every term is integers cast to doubles composed
    * with a FIXED parenthesization of correctly-rounded IEEE ops (the
    * q57 discipline), the log rounds to 8dp, and the per-doc mean is a
    * decimal-exact sum — the DuckDB oracle replays the identical
    * expression tree. The unseen-history test keys off N1+(w1,·)
    * (a word seen only document-final has occurrences but no
    * continuations; KN backs it off to the continuation model). */
  def knScore(train: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val m = knTrain(train, textCol)
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(wordNgramsNative(tokens(col(textCol)), 2)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .withColumn("__vk", lit(1))
    val scored = grams
      .join(m.bgCounts, Seq("bg"), "left")
      .join(m.hCounts, Seq("w1"), "left")
      .join(m.fwCounts, Seq("w1"), "left")
      .join(m.contCounts, Seq("w2"), "left")
      .join(broadcast(m.totals.withColumn("__vk", lit(1))), Seq("__vk"))
    val pc = (coalesce(col("ncont"), lit(0L)) + lit(1L)).cast("double") /
      (col("dd") + col("v")).cast("double")
    val p = when(col("n1p").isNotNull,
      greatest(coalesce(col("c12"), lit(0L)).cast("double") - lit(0.75d),
        lit(0.0d)) / col("hc").cast("double") +
        (lit(0.75d) * col("n1p").cast("double") / col("hc").cast("double")) * pc)
      .otherwise(pc)
    scored.withColumn("lp", round(log(p), 8))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp").cast("decimal(20,8)")).cast("double") /
          count(lit(1)), 6).as("avg_logprob"))
  }

  /** Character-entropy quality signal: Shannon entropy of each
    * document's codepoint distribution — low = repeated filler /
    * degenerate generation, very high = base64/binary spill; natural
    * text sits in a band. One codegen'd kernel call per row
    * ([[graft.functions.expr.CharEntropy]]), shuffle-free map tier. */
  def charEntropyProfile(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      charEntropy(col(textCol)).as("char_entropy"))

  /** Fused per-document quality feature vector: EVERY map-tier
    * quality signal — token count, heuristic quality score, language
    * pick, repetition ratio, char entropy, and the Gopher gate — from
    * ONE corpus scan. Each signal is a codegen'd kernel call; Catalyst
    * collapses the stacked projections into a single whole-stage
    * span, so at 100 TB this costs one pass where running the six
    * catalog entries separately costs six. The feature frame a
    * curation gate, classifier trainer, or data-card publisher
    * consumes. */
  def qualitySignals(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val toks = tokens(col(textCol))
    val m = ColumnBridge.column(graft.functions.expr.GopherMeasures(
      ColumnBridge.expression(col(textCol)),
      ColumnBridge.expression(toks),
      gopherStopwords))
    val measured = docs.select(
      col(idCol).as("doc_id"),
      size(toks).as("n_tokens"),
      qualityScoreCol(col(textCol)).as("quality_score"),
      detectedLang(toks).as("detected_lang"),
      repetitionRatioNative(toks, 3).as("repetition_ratio"),
      charEntropy(col(textCol)).as("char_entropy"),
      m.as("__m"))
      .select(col("doc_id"), col("n_tokens"), col("quality_score"),
        col("detected_lang"), col("repetition_ratio"), col("char_entropy"),
        col("__m.n_words").as("n_words"),
        col("__m.mean_word_len").as("mean_word_len"),
        col("__m.symbol_ratio").as("symbol_ratio"),
        col("__m.bullet_ratio").as("bullet_ratio"),
        col("__m.ellipsis_ratio").as("ellipsis_ratio"),
        col("__m.alpha_ratio").as("alpha_ratio"),
        col("__m.stopword_hits").as("stopword_hits"))
    withGopherFlags(measured, 20, 10000, 3.0, 10.0, 0.1, 0.9, 0.3, 0.8, 2)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"),
        col("detected_lang"), col("repetition_ratio"), col("char_entropy"),
        col("pass").cast("int").as("gopher_pass"))
  }

  /** PMI collocation extraction (public technique: Church & Hanks
    * 1990, "Word association norms, mutual information, and
    * lexicography"): the top-k adjacent-word pairs by pointwise
    * mutual information
    *
    *   pmi(w1,w2) = ln( (c12/N) / ((c1/U) * (c2/U)) )
    *
    * at a minimum bigram support — the classic multiword-expression /
    * phrase-vocabulary pass (tokenizer phrase merges, stop-phrase
    * lists, word2vec-style phrase detection all start here). N =
    * bigram positions, U = token occurrences.
    *
    * Shape: one bigram scan feeds the pair counts, one token scan the
    * unigram counts; both joins are vocabulary-sized; the cut is an
    * orderBy+limit (TakeOrderedAndProject — never a full sort of the
    * pair table). Fixed IEEE parenthesization + 8dp-rounded ln + 6dp
    * final round keep ranking engine-exact (ties at the rounded pmi
    * resolve by bigram text). */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5L, k: Int = 50): DataFrame = {
    val bg = knBigrams(docs, textCol)
    val bc = bg.groupBy(col("bg"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .where(col("c12") >= minCount)
    val un = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = bg.agg(count(lit(1)).as("nb")).crossJoin(
      un.agg(sum(col("c")).as("ub")))
    val scored = bc
      .join(un.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(un.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(tot))
      .select(col("bg").as("bigram"), col("c12"),
        round(log(
          (col("c12").cast("double") / col("nb").cast("double")) /
            ((col("c1").cast("double") / col("ub").cast("double")) *
              (col("c2").cast("double") / col("ub").cast("double")))), 6)
          .as("pmi"))
    // __bnd rename: the rank window runs over the limit(k) survivors —
    // a bounded frame, declared so for graft.WindowTripwire.
    scored.orderBy(col("pmi").desc, col("bigram")).limit(k)
      .withColumn("__bnd_pmi", col("pmi"))
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("__bnd_pmi").desc, col("bigram"))).cast("int"))
      .drop("__bnd_pmi")
  }

  /** Vocabulary growth curve (Heaps'-law profiling — Heaps 1978): at
    * `steps` id-prefix checkpoints (doc_id order standing in for
    * ingestion order), the document count, token mass, distinct-token
    * vocabulary, and type-token ratio — the corpus-composition signal
    * that says whether more data still buys vocabulary (and hence how
    * big a tokenizer vocab the corpus supports).
    *
    * Shape: vocabulary size at EVERY checkpoint comes from one
    * (token, first_doc) frame — a single groupBy over the token scan —
    * joined against the tiny checkpoint frame; no per-checkpoint
    * corpus rescan. The checkpoint cross joins touch vocabulary- and
    * doc-stat-sized frames only. */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
      steps: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    val fd = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("first_doc"))
    val dstat = docs.select(col(idCol).as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("nt"))
    val mx = dstat.agg(max(col("doc_id")).as("mx"))
    val thr = spark.range(1, steps + 1)
      .select(col("id").cast("int").as("pct_step"))
      .crossJoin(broadcast(mx))
      .select(col("pct_step"),
        floor(col("mx") * col("pct_step") / lit(steps)).cast("long")
          .as("max_doc"))
    val voc = fd.crossJoin(broadcast(thr))
      .where(col("first_doc") <= col("max_doc"))
      .groupBy(col("pct_step"), col("max_doc"))
      .agg(count(lit(1)).as("vocab_size"))
    dstat.crossJoin(broadcast(thr))
      .where(col("doc_id") <= col("max_doc"))
      .groupBy(col("pct_step"), col("max_doc"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      .join(voc, Seq("pct_step", "max_doc"), "left")
      .select(col("pct_step"), col("max_doc"), col("n_docs"), col("n_tokens"),
        coalesce(col("vocab_size"), lit(0L)).as("vocab_size"),
        round(coalesce(col("vocab_size"), lit(0L)).cast("double") /
          col("n_tokens").cast("double"), 6).as("ttr"))
  }

  /** Stupid-backoff trigram scoring (public technique: Brants et al.
    * 2007, "Large Language Models in Machine Translation" — the
    * UNNORMALIZED backoff score designed exactly for distributed
    * corpora: no discount mass bookkeeping, every level a plain count
    * ratio, fixed backoff factor α = 0.4):
    *
    *   S(w3|w1w2) = c(w1w2w3)/c(w1w2)          if the trigram is seen
    *              = α · c(w2w3)/c(w2)          else if the bigram is
    *              = α² · (c(w3)+1)/(N+V)       else (add-one unigram
    *                floor keeps every token scorable)
    *
    * Counts are three map-side-combined groupBys over one token scan
    * family; scoring is left hash joins on the gram-string keys. The
    * same 8dp-ln / decimal-doc-sum discipline as [[ngramLmScore]] and
    * [[knScore]]; α's double value is the same literal in both
    * engines and each multiply is one correctly-rounded IEEE op. */
  def stupidBackoffScore(train: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val toksT = tokens(col(textCol))
    val tri = train.select(explode(wordNgramsNative(toksT, 3)).as("tg"))
      .groupBy(col("tg")).agg(count(lit(1)).as("c123"))
    val bi = train.select(explode(wordNgramsNative(toksT, 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val uni = train.select(explode(toksT).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val tot = uni.agg(sum(col("c1")).as("nn"),
      count(lit(1)).as("v"))
    val d = (c: Column) => c.cast("double")
    val w2 = substring_index(substring_index(col("tg"), " ", 2), " ", -1)
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(wordNgramsNative(tokens(col(textCol)), 3)).as("tg"))
      .withColumn("w12", substring_index(col("tg"), " ", 2))
      .withColumn("w3", substring_index(col("tg"), " ", -1))
      .withColumn("w23", concat(w2, lit(" "), substring_index(col("tg"), " ", -1)))
      .withColumn("w2o", w2)
      .withColumn("__vk", lit(1))
    val scored = grams
      .join(tri, Seq("tg"), "left")
      .join(bi.select(col("bg").as("w12"), col("c12")), Seq("w12"), "left")
      .join(bi.select(col("bg").as("w23"), col("c12").as("c23")),
        Seq("w23"), "left")
      .join(uni.select(col("w").as("w2o"), col("c1").as("c2")),
        Seq("w2o"), "left")
      .join(uni.select(col("w").as("w3"), col("c1").as("c3")),
        Seq("w3"), "left")
      .join(broadcast(tot.withColumn("__vk", lit(1))), Seq("__vk"))
    val p = when(col("c123").isNotNull, d(col("c123")) / d(col("c12")))
      .otherwise(lit(0.4) *
        when(col("c23").isNotNull, d(col("c23")) / d(col("c2")))
          .otherwise(lit(0.4) *
            (d(coalesce(col("c3"), lit(0L)) + lit(1L)) /
              d(col("nn") + col("v")))))
    scored.withColumn("lp", round(log(p), 8))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        round(sum(col("lp").cast("decimal(20,8)")).cast("double") /
          count(lit(1)), 6).as("avg_logprob"))
  }

  /** Degenerate-repetition run detector (the "the the the" / looped-
    * generation filter — the n-gram loop signal beside [[repetition]]'s
    * distinct-shingle ratio): per document, the longest run of one
    * repeated token, its token, and a loop flag. One position explode
    * + the lag/running-sum run-length chain + a doc-keyed struct-max
    * (ties: longest run, then earliest start — deterministic). */
  def tokenRuns(docs: DataFrame, idCol: String, textCol: String,
      loopAt: Int = 5): DataFrame = {
    // "__ent_doc_id": the run-length windows are bounded by one
    // document's tokens — marker-sanctioned (VERDICT r09 item 2).
    val base = docs.select(col(idCol).as("__ent_doc_id"),
      tokens(col(textCol)).as("toks"))
    val byDoc = Window.partitionBy(col("__ent_doc_id")).orderBy(col("pos"))
    val runs = base.where(size(col("toks")) >= 1)
      .select(col("__ent_doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("brk",
        when(lag(col("tok"), 1).over(byDoc).isNull ||
          lag(col("tok"), 1).over(byDoc) =!= col("tok"), 1).otherwise(0))
      .withColumn("run_id",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("__ent_doc_id"), col("run_id"))
      .agg(count(lit(1)).cast("int").as("run_len"),
        min(col("pos")).as("start_pos"), first(col("tok")).as("tok"))
    val best = runs
      .groupBy(col("__ent_doc_id"))
      .agg(max(struct(col("run_len"), (-col("start_pos")).as("np"),
        col("tok"))).as("m"))
      .select(col("__ent_doc_id").as("doc_id"), col("m.run_len").as("max_run"),
        col("m.tok").as("run_token"))
    base.select(col("__ent_doc_id").as("doc_id"),
        size(col("toks")).as("n_tokens"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("max_run"), lit(0)).as("max_run"),
        coalesce(col("run_token"), lit("")).as("run_token"),
        (coalesce(col("max_run"), lit(0)) >= loopAt).cast("int").as("looped"))
  }

  /** Content fingerprints: md5 + 1-hash MinHash over char 5-grams, via
    * the native codegen'd [[graft.functions.expr.MinShingleHash]] — the
    * declarative `contentFingerprint` form pays O(len) interpreted
    * substr+md5 lambda evaluations per document (and was evaluated
    * twice, once per extracted struct field). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      md5(col(textCol)).as("md5_hash"),
      minShingleHash(col(textCol), 5, 0).as("min_shingle_hash"))

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020,
    * facebookresearch/cc_net `perplexity.py`): score every document
    * with the [[ngramLmScore]] LM trained on a target-domain corpus,
    * then split the corpus into `head`/`middle`/`tail` by score — the
    * standard quality stratification applied to web data before
    * sampling a training mix (head = most target-like).
    *
    * Bucket boundaries are VALUE quantiles computed from the score
    * DISTRIBUTION, not a per-row rank: a groupBy histogram over the
    * (6dp-rounded, hence bounded-cardinality) scores, a cumulative
    * window over that small histogram, and an equi-join of the
    * score→bucket map back onto the per-doc frame (AQE broadcasts it
    * when small — not pinned, since a 6dp score grid can still reach
    * 1e7+ distinct values at corpus scale). At 100 TB this is
    * one map-side-combined groupBy plus a runtime-sized join — never
    * a global sort or single-partition window over corpus rows, which
    * is what `ntile()` over an unpartitioned window would cost. Ties
    * (equal scores) land in one bucket by construction, so the split
    * is deterministic and engine-invariant with no id tiebreak needed:
    * bucket(s) = ceil(cum(s) * nBuckets / N) where cum(s) = number of
    * docs scoring >= s. */
  def perplexityBuckets(train: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, nBuckets: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets >= 2, s"need >= 2 buckets, got $nBuckets")
    // Persisted under a lease: the scored frame feeds BOTH the
    // histogram and the final join — unpersisted, the whole LM
    // scoring chain would execute twice (observed in the q78 plan:
    // 38 exchanges vs 20 with the lease).
    val scored = ngramLmScore(train, docs, idCol, textCol)
      .select(col("doc_id"), col("avg_logprob"))
      .persist()
    // Histogram over distinct 6dp scores: small (bounded by the score
    // grid), so the unpartitioned cumulative window is over a frame
    // ~|distinct scores|, not |docs|.
    // (__bnd name: bounded-frame declaration for graft.WindowTripwire.)
    val hist = scored.groupBy(col("avg_logprob"))
      .agg(count(lit(1)).as("__bnd_nb"))
    val cum = hist
      .withColumn("cum", sum(col("__bnd_nb"))
        .over(Window.orderBy(col("avg_logprob").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_total", sum(col("__bnd_nb")).over(Window.partitionBy()))
      // ceil(cum * nB / N) in integer arithmetic: exact in any engine.
      .select(col("avg_logprob"),
        ((col("cum") * nBuckets + col("n_total") - 1) / col("n_total"))
          .cast("long").as("bucket_idx"))
    val named = cum.withColumn("ppl_bucket",
      when(col("bucket_idx") === 1, "head")
        .when(col("bucket_idx") === nBuckets, "tail")
        .otherwise("middle"))
      .drop("bucket_idx")
    CacheLease.releaseAfterAction(
      scored.join(named, Seq("avg_logprob"))
        .select(col("doc_id"), col("avg_logprob"), col("ppl_bucket"))
    )(() => { scored.unpersist(); () })
  }

  /** Stop words for the Gopher "contains common English words" rule —
    * the published list (Rae et al. 2021, appendix A1.1). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality rule set (Rae et al. 2021, appendix A1.1)
    * — the published heuristic gates applied to MassiveWeb before
    * training: word-count band, mean-word-length band, symbol-to-word
    * ratio ('#' and '...'), bullet-line and ellipsis-line shares,
    * alphabetic-word fraction, and a minimum count of distinct common
    * stop words. Emits one row per document with every measured ratio
    * (6dp), a per-rule boolean, and the conjunctive `pass` — keeping
    * the per-rule columns is what makes the gate auditable (which rule
    * kills how much of a corpus is the first question asked of it).
    *
    * Thresholds are parameters; the defaults here follow the paper
    * except the word-count band, which is scaled to the fixture corpus
    * (10-99-word synthetic docs vs the paper's 50-100k band for web
    * pages).
    *
    * Scale shape: a pure per-row expression pipeline over codegen'd
    * higher-order functions — no shuffle, no UDF; fuses into the scan
    * like [[qualityScore]]. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 20, maxWords: Int = 10000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletRatio: Double = 0.9, maxEllipsisRatio: Double = 0.3,
      minAlphaRatio: Double = 0.8, minStopwords: Int = 2): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // All measures in ONE codegen kernel call per row (the
    // declarative HOF form below pays five interpreted lambdas per
    // document — finding #1; measured 0.98 -> ~0.4 s at sf0.1).
    // Spec-pinned row-equal to the declarative reference.
    val m = ColumnBridge.column(graft.functions.expr.GopherMeasures(
      ColumnBridge.expression(col(textCol)),
      ColumnBridge.expression(tokens(col(textCol))),
      gopherStopwords))
    withGopherFlags(
      docs.select(col(idCol).as("doc_id"), m.as("__m"))
        .select(col("doc_id"),
          col("__m.n_words").as("n_words"),
          col("__m.mean_word_len").as("mean_word_len"),
          col("__m.symbol_ratio").as("symbol_ratio"),
          col("__m.bullet_ratio").as("bullet_ratio"),
          col("__m.ellipsis_ratio").as("ellipsis_ratio"),
          col("__m.alpha_ratio").as("alpha_ratio"),
          col("__m.stopword_hits").as("stopword_hits")),
      minWords, maxWords, minMeanWordLen, maxMeanWordLen, maxSymbolRatio,
      maxBulletRatio, maxEllipsisRatio, minAlphaRatio, minStopwords)
  }

  /** The rule booleans + conjunctive pass over a measured frame —
    * shared by the kernel path and the declarative reference. */
  private def withGopherFlags(measured: DataFrame,
      minWords: Int, maxWords: Int,
      minMeanWordLen: Double, maxMeanWordLen: Double,
      maxSymbolRatio: Double, maxBulletRatio: Double,
      maxEllipsisRatio: Double, minAlphaRatio: Double,
      minStopwords: Int): DataFrame =
    measured
      .withColumn("words_ok",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("word_len_ok", col("mean_word_len") >= minMeanWordLen &&
        col("mean_word_len") <= maxMeanWordLen)
      .withColumn("symbol_ok", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("bullet_ok", col("bullet_ratio") <= maxBulletRatio)
      .withColumn("ellipsis_ok", col("ellipsis_ratio") <= maxEllipsisRatio)
      .withColumn("alpha_ok", col("alpha_ratio") >= minAlphaRatio)
      .withColumn("stopword_ok", col("stopword_hits") >= minStopwords)
      .withColumn("pass", col("words_ok") && col("word_len_ok") &&
        col("symbol_ok") && col("bullet_ok") && col("ellipsis_ok") &&
        col("alpha_ok") && col("stopword_ok"))

  /** Per-group sequence-length distribution with EXACT order-statistic
    * percentiles (p50/p90/p99 as the ceil(q*n)-th smallest value — the
    * `quantile_disc` rule, written out as row_number arithmetic so
    * both engines pick the IDENTICAL order statistic; `percentile_
    * approx` is a sketch and cross-engine unstable). The number that
    * sizes packing budgets and max_seq_len: p99 token length per
    * source decides truncation loss.
    *
    * Scale shape (the [[graft.operators.Ranking.exactQuantilesBy]]
    * histogram discipline — this used to rank per-group rows in a
    * window partitioned by the GROUP, which at corpus scale puts the
    * dominant source's every row on one task): one map-side-combined
    * groupBy builds the per-(group, length) histogram; the cumulative
    * windows run over THAT bounded frame (|distinct lengths per group|
    * rows); percentile picks and all five summary stats fold out of
    * the histogram in one final aggregate — no per-document window
    * anywhere. The rank targets are integer arithmetic (ceil(q*n) =
    * (q*100*n + 99) div 100) over counts, exact on both engines and
    * identical to the ranked form for ties (every rank inside a tie
    * run maps to the same length value). `idCol` is retained for
    * signature stability; the histogram form needs no tiebreak. */
  def lengthProfile(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame = {
    val hist = docs
      .select(col(groupCol).as("grp"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .groupBy(col("grp"), col("n_tokens"))
      .agg(count(lit(1)).as("__bnd_nb"))
    val cum = hist
      .withColumn("__cum", sum(col("__bnd_nb")).over(
        Window.partitionBy(col("grp")).orderBy(col("n_tokens"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__bnd_nb")).over(
        Window.partitionBy(col("grp"))))
    def target(pct: Int): Column =
      floor((col("__n") * pct + lit(99)) / lit(100)).cast("long")
    def pick(pct: Int): Column =
      min(when(col("__cum") >= target(pct), col("n_tokens")))
    cum
      .groupBy(col("grp").as(groupCol))
      .agg(sum(col("__bnd_nb")).as("n_docs"),
        sum(col("n_tokens") * col("__bnd_nb")).as("total_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        pick(50).as("p50_tokens"),
        pick(90).as("p90_tokens"),
        pick(99).as("p99_tokens"))
  }

  /** The declarative HOF reference implementation of the Gopher
    * measures — kept (the TextFunctions convention) as the readable
    * form the kernel is spec-tested equal to; interpreted lambdas
    * make it the slow path. */
  private[graft] def gopherRulesDeclarative(docs: DataFrame,
      idCol: String, textCol: String,
      minWords: Int = 20, maxWords: Int = 10000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletRatio: Double = 0.9, maxEllipsisRatio: Double = 0.3,
      minAlphaRatio: Double = 0.8, minStopwords: Int = 2): DataFrame = {
    val toks = tokens(col(textCol))
    val nw = size(toks)
    val lines = split(col(textCol), "\n")
    val nl = size(lines)
    // '#' occurrences + non-overlapping '...' occurrences, per word.
    val hashes = length(col(textCol)) -
      length(regexp_replace(col(textCol), "#", ""))
    val ellipses = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / lit(3)
    // Per-word ratios are null for empty documents (ANSI mode errors
    // on the zero divisor otherwise); the word-count rule still fails
    // them, so `pass` stays a real false (false AND null = false).
    def perWord(c: Column): Column =
      when(nw === 0, lit(null)).otherwise(round(c.cast("double") / nw, 6))
    val meanLen = perWord(
      aggregate(toks, lit(0L), (acc, w) => acc + length(w)))
    val symRatio = perWord(hashes + ellipses)
    val bulletRatio = round(
      size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("double") /
        nl, 6)
    val ellipsisRatio = round(
      size(filter(lines, l => l.rlike("\\.\\.\\.$"))).cast("double") / nl, 6)
    val alphaRatio = perWord(size(filter(toks, w => w.rlike("[A-Za-z]"))))
    val stopHits = size(filter(
      array(gopherStopwords.map(lit): _*), w => array_contains(toks, w)))
    withGopherFlags(
      docs.select(
        col(idCol).as("doc_id"), nw.as("n_words"),
        meanLen.as("mean_word_len"), symRatio.as("symbol_ratio"),
        bulletRatio.as("bullet_ratio"), ellipsisRatio.as("ellipsis_ratio"),
        alphaRatio.as("alpha_ratio"), stopHits.as("stopword_hits")),
      minWords, maxWords, minMeanWordLen, maxMeanWordLen, maxSymbolRatio,
      maxBulletRatio, maxEllipsisRatio, minAlphaRatio, minStopwords)
  }
}
