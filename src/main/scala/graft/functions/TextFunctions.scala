package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline tier (BASELINE.json north
  * star: dedup / text analysis at 100 TB scale).
  *
  * Everything here is built from Catalyst higher-order functions
  * (`transform`/`filter`/`aggregate`) and built-ins — no UDFs — so the
  * whole pipeline stays inside whole-stage codegen and is portable to any
  * Spark cluster unchanged.
  *
  * Hashing convention: all content hashes derive from `md5` (hex string).
  * md5 is deterministic across JVMs, partitions, and engines (the DuckDB
  * oracle reproduces it bit-for-bit), unlike `hash`/`xxhash64` whose seeds
  * are engine-specific. Lexicographic min over fixed-width hex = numeric
  * min over the underlying value, so MinHash can stay in string space.
  */
object TextFunctions {

  /** Whitespace tokens, empty strings removed (leading/trailing blanks).
    *
    * `array_remove(_, "")` rather than the equivalent
    * `filter(_, t => t =!= "")`: `filter` is a higher-order function and
    * therefore CodegenFallback — an interpreted per-element lambda on
    * what is the first step of EVERY text operator — while
    * `array_remove` is a codegen'd native expression. Identical output:
    * both drop exactly the empty-string elements `split` produces at
    * whitespace boundaries (split never yields null elements). */
  def tokens(text: Column): Column =
    array_remove(split(text, "\\s+"), "")

  /** Distinct character k-gram shingles. Documents shorter than k yield
    * the whole text as a single shingle (guards `sequence`'s descending
    * step when length-k+1 < 1). */
  def charShingles(text: Column, k: Int): Column = {
    val n = length(text) - lit(k - 1)
    when(n >= 1,
      array_distinct(transform(sequence(lit(1), n), i => text.substr(i, lit(k)))))
      .otherwise(array(text))
  }

  /** Distinct word n-gram shingles from a token array. */
  def wordShingles(toks: Column, n: Int): Column = {
    val cnt = size(toks) - lit(n - 1)
    when(cnt >= 1,
      array_distinct(transform(sequence(lit(0), cnt - 1),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** One MinHash value: min over shingles of a salted md5. 16 hex chars
    * (64 bits) keeps collision probability negligible. */
  private def minHash(shingles: Column, salt: Int): Column =
    array_min(transform(shingles,
      s => substring(md5(concat(lit(s"$salt:"), s)), 1, 16)))

  /** MinHash signature: `numHashes` independent salted minima.
    *
    * Cost is O(numHashes x |shingles|) md5 calls per document — the
    * classic MinHash tradeoff; at 100 TB this is embarrassingly parallel
    * (per-row, no shuffle) and bounded by CPU, not memory. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map(h => minHash(shingles, h)): _*)

  /** LSH band keys: signature split into `bands` bands of
    * `numHashes/bands` rows; each band hashed to one bucket key. Two docs
    * collide on a band iff that band of the signature agrees exactly. */
  def lshBandKeys(signature: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, s"bands ($bands) must divide numHashes ($numHashes)")
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat(b.cast("string"), lit("|"),
        md5(array_join(slice(signature, b * lit(rows) + lit(1), lit(rows)), ","))))
  }

  /** Band keys computed straight from the shingle set, statically
    * unrolled so each of the `numHashes` min-hashes is evaluated exactly
    * once per row.
    *
    * [[lshBandKeys]]([[minhashSignature]]) is the readable composition,
    * but Spark performs no common-subexpression elimination inside
    * higher-order-function lambdas: the signature subtree embedded in the
    * per-band lambda is re-evaluated once PER BAND — a `bands`-fold
    * recompute of every md5 (measured 16x = ~340 s vs ~20 s at sf0.1).
    * Unrolling bands/rows driver-side keeps the per-row cost at
    * numHashes x |shingles| md5 calls, the MinHash lower bound. */
  def minhashBandKeys(shingles: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, s"bands ($bands) must divide numHashes ($numHashes)")
    array((0 until bands).map { b =>
      concat(lit(s"$b|"),
        md5(concat_ws(",", (0 until rows).map(r => minHash(shingles, b * rows + r)): _*)))
    }: _*)
  }

  /** 32-bit md5-derived token hash (as a long) — the per-token hash that
    * feeds SimHash bit votes. `conv` parses the leading 8 hex chars. */
  def tokenHash32(tok: Column): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long")

  /** Mersenne prime 2^61-1 — modulus for the MinHash permutation
    * family `h -> (a*h + b) mod p`.
    *
    * The coefficients are ~60-bit, so a*h needs 128-bit arithmetic
    * (Spark DECIMAL(38,0) / DuckDB HUGEINT — both exact) before the
    * reduction. That width is NOT optional: an earlier revision used
    * 28-bit coefficients so that a*h stayed below 2^60 in a plain
    * long — which means the `mod p` NEVER WRAPPED, every "permutation"
    * was order-preserving in h, and all `numHashes` minima picked the
    * same argmin shingle. A MinHash signature whose rows are perfectly
    * correlated estimates Jaccard all-or-nothing per pair (P(agree)=J
    * jointly, not per row) — banding recall silently collapsed for
    * near-dups while exact dups (J=1) still matched, which is why the
    * flaw survived two rounds of green oracle checks that mirrored the
    * same broken family. */
  val MinhashPrime: Long = (1L << 61) - 1

  /** Deterministic universal-hash coefficients (a_i odd ~60-bit, b_i
    * ~60-bit, both < p), derived from md5 so any engine (the DuckDB
    * oracle, a different Spark cluster) can reproduce them from the
    * index alone. */
  def minhashCoefficients(numHashes: Int): Seq[(Long, Long)] = {
    def h15(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15), 16)
    }
    (0 until numHashes).map(i => (h15(s"perm-a-$i") | 1L, h15(s"perm-b-$i")))
  }

  /** One codegen'd 32-bit hash per shingle string (for the relational
    * MinHash path — see [[graft.operators.TextDedup.minhashLshPairs]]). */
  def shingleHash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Bit b of a nonnegative long, with b itself a column: floor(h/2^b)%2.
    * Division by a power of two is exact in doubles (h < 2^53), so the
    * truncating cast equals a right shift — needed because Spark's
    * `shiftright(col, bits: Int)` can't take a lambda-bound bit index. */
  private def bitAt(h: Column, b: Column): Column =
    (h.cast("double") / pow(lit(2.0), b)).cast("long") % 2

  /** Per-token 32-bit hash array — materialize this as its own column
    * (ideally behind a cache/exchange) before feeding [[simhash32]]:
    * the md5s are the expensive part and must be computed once per row,
    * not once per sketch bit. */
  def tokenHashes(toks: Column): Column = transform(toks, t => tokenHash32(t))

  /** 32-bit SimHash from a precomputed token-hash array: bit b of the
    * result is set iff the sum of per-token votes (+1 if bit b of the
    * token hash is set, else -1) is positive. Duplicate tokens vote
    * multiple times (frequency weighting), the standard Charikar
    * construction.
    *
    * Takes hashes, not tokens: Spark re-evaluates the lambda-embedded
    * subtree once per outer aggregate step (no CSE inside higher-order
    * functions), so inlining `tokenHashes` here would recompute every
    * token md5 32 times. */
  def simhash32(hashes: Column): Column =
    aggregate(
      sequence(lit(0), lit(31)),
      lit(0L),
      (acc, b) => {
        val vote = aggregate(hashes, lit(0L),
          (a, h) => a + bitAt(h, b) * 2 - 1)
        acc + when(vote > 0, pow(lit(2.0), b).cast("long")).otherwise(lit(0L))
      })

  /** Byte `b` (0-3, column-valued) of a nonnegative 32-bit value. */
  def byteAt(h: Column, b: Column): Column =
    (h.cast("double") / pow(lit(2.0), b * 8)).cast("long") % 256

  /** Hamming distance between two 32-bit SimHashes. */
  def hamming32(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Rolling/content fingerprint of a document: full-text md5 plus the
    * minimum shingle hash (a 1-hash MinHash — stable under small edits
    * with probability 1 - 1/|shingles|). Declarative reference form;
    * the hot path is [[minShingleHash]] (native, codegen'd), which is
    * property-tested equal. */
  def contentFingerprint(text: Column, k: Int): Column =
    struct(
      md5(text).as("md5"),
      minHash(charShingles(text, k), 0).as("min_shingle_hash"))

  /** Native codegen'd 1-hash MinHash over char k-grams — identical
    * output to `minHash(charShingles(text, k), salt)`, O(len) salted
    * md5s in a tight JVM loop instead of interpreted per-element
    * lambdas. */
  def minShingleHash(text: Column, k: Int, salt: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.MinShingleHash(
      ColumnBridge.expression(text), k, salt))
  }

  /** Shannon codepoint entropy (bits/char), codegen'd
    * ([[graft.functions.expr.CharEntropy]]); empty strings are null. */
  def charEntropy(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.CharEntropy(
      ColumnBridge.expression(text)))
  }

  /** Native codegen'd distinct word n-gram shingles — identical output
    * to [[wordShingles]] (first-occurrence order), one JVM loop per row. */
  def wordShinglesNative(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.WordShingles(
      ColumnBridge.expression(toks), n))
  }

  /** Native all-positions word n-grams (duplicates kept — LM
    * statistics; [[wordShinglesNative]] dedups for set similarity). */
  def wordNgramsNative(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.WordNgrams(
      ColumnBridge.expression(toks), n))
  }

  /** Native all-positions char n-grams (duplicates kept — tokenizer /
    * BPE merge statistics; the char shingles dedup for fingerprints). */
  def charNgramsNative(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.CharNgrams(
      ColumnBridge.expression(text), n))
  }

  /** Native BPE merge replay: a token's symbol sequence after applying
    * a learned merge list in creation order (merges ride as one
    * codegen reference object — plan O(1) in the merge count). */
  def bpeApplyMergesNative(token: Column, merges: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.BpeApplyMerges(
      ColumnBridge.expression(token), merges))
  }

  /** Native Viterbi segmentation under a referenced unigram-LM model
    * (plan O(1) in vocabulary size — the [[bpeApplyMergesNative]]
    * discipline for the SentencePiece family). */
  def unigramSegmentNative(word: Column,
      model: graft.functions.expr.UnigramModel): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.UnigramSegment(
      ColumnBridge.expression(word), model))
  }

  /** Native left-fold probability product of a piece array under a
    * referenced unigram-LM model — equals the Viterbi DP score for
    * kernel-produced segmentations. */
  def unigramPieceScoreNative(pieces: Column,
      model: graft.functions.expr.UnigramModel): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.UnigramPieceScore(
      ColumnBridge.expression(pieces), model))
  }

  /** Native one-pass repetition ratio (already rounded to 6dp) — the
    * filter-safe single-kernel form of
    * `round(1 - distinct_shingles/positions, 6)`. */
  def repetitionRatioNative(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.RepetitionRatio(
      ColumnBridge.expression(toks), n))
  }

  /** Native codegen'd overlapping token chunks (embedding/RAG
    * chunking): windows of `size` tokens advancing by `size-overlap`;
    * the final partial window is kept; no window starts after one has
    * already covered the last token. */
  def tokenChunksNative(toks: Column, size: Int, overlap: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.TokenChunks(
      ColumnBridge.expression(toks), size, overlap))
  }
}
