package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document deduplication operators (LLM-data-pipeline tier).
  *
  * Four escalating strategies, all shuffle-on-key MapReduce shapes that
  * hold at 100 TB (no cross joins, no driver-side state):
  *
  *  - [[exact]] — hash-groupBy on a normalized content hash.
  *  - [[ngramJaccardPairs]] — EXACT all-pairs Jaccard >= t via the
  *    inverted-index pattern: explode shingles, equi-join on shingle,
  *    count shared per pair. Exhaustive for t > 0 because any pair with
  *    Jaccard > 0 shares at least one shingle; never materializes the
  *    O(n^2) cross product, only pairs that actually co-occur.
  *  - [[minhashLshPairs]] — approximate: MinHash signatures banded into
  *    LSH buckets; candidate pairs verified with exact Jaccard. The
  *    scale path when even the inverted index is too hot (stopword-like
  *    shingles): work is O(candidates), tunable via bands/rows.
  *  - [[simhashPairs]] — bit-sketch dedup: 32-bit SimHash, candidates
  *    from byte-band equality (pigeonhole: hamming <= 3 over 4 bytes
  *    forces >= 1 equal byte), verified by true hamming distance.
  */
object TextDedup {

  /** Exact dedup groups: one row per distinct normalized text, canonical
    * id = min doc id, plus the duplicate count. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        md5(lower(trim(col(textCol)))).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_dups"))

  /** Per-document distinct word n-gram shingle sets (array form — for
    * API use; the pair operators use [[shingleIndex]] instead). */
  private def shingled(docs: DataFrame, idCol: String, textCol: String, n: Int) =
    docs.select(
      col(idCol).as("doc_id"),
      wordShingles(tokens(col(textCol)), n).as("shingles"))

  /** Distinct (doc_id, hashed-shingle) inverted index, built fully
    * relationally: posexplode tokens -> window `lead` assembles each
    * n-gram -> hash -> distinct. The array-lambda form
    * (`wordShingles`) runs interpreted (higher-order functions are
    * CodegenFallback) and measured ~7 s per evaluation at sf0.1 vs
    * well under 1 s for this codegen'd pipeline — and `count()`-style
    * probes hide that cost because column pruning skips the array
    * entirely. Documents with fewer than n tokens contribute their
    * whole token sequence as one shingle (same fallback as
    * `wordShingles` and the DuckDB oracle). */
  private def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
      n: Int, hashShingle: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val ordered = byDoc.orderBy(col("pos"))
    val leads = (1 until n).map(i => lead(col("tok"), i).over(ordered))
    val withSh = toks
      .withColumn("cnt", count(lit(1)).over(byDoc))
      .withColumn("shingle", concat_ws(" ", (col("tok") +: leads): _*))
      .withColumn("complete",
        if (n > 1) leads.last.isNotNull else lit(true))
    val main = withSh
      .where(col("cnt") >= n && col("complete"))
      .select(col("doc_id"), hashShingle(col("shingle")).as("sh"))
    // Tiny-doc fallback (cnt < n): the whole token sequence, in order,
    // as a single shingle. Rare by construction — fine to aggregate.
    val tiny = withSh.where(col("cnt") < n)
      .groupBy(col("doc_id"))
      .agg(hashShingle(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok")), " ")).as("sh"))
    main.unionByName(tiny).distinct()
  }

  /** Jaccard from a (doc_id, sh) inverted index of hashed shingles:
    * a join counts the shared hashes per pair, per-doc counts give the
    * set sizes, and |aUb| = |a|+|b|-|a^b|. Hashes instead of shingle
    * strings (xxhash64 / md5-derived by caller): an 8-byte key halves
    * the shuffled bytes and joins compare longs; a within-document
    * collision (probability ~|sh|^2/2^64) is the only way a count can
    * differ from true set intersection — negligible. Callers pass the
    * index CACHED: two primitive longs per row columnar-cache cheaply,
    * and the index is read 3-5 times per pair pipeline (self-join
    * sides, size counts, verify) — unlike the old array<string>
    * intermediates, whose cache build cost more than recomputing. */
  private def jaccardFromIndex(inverted: DataFrame, threshold: Double,
      candidates: Option[DataFrame]): DataFrame = {
    val sizes = inverted.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val shared = candidates match {
      case None =>
        // All-pairs mode: self-join the whole index. Hot shingles make
        // this inherently O(sum over shingles of df^2) — the exact
        // algorithm's cost; LSH banding is the cheap-candidate path.
        inverted.as("a")
          .join(inverted.as("b").hint("shuffle_hash"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      case Some(c) =>
        // Candidate mode: fan each pair out over doc_a's hashes, then
        // count which also occur under doc_b — work is
        // O(|candidates| x avg set size), never the full pair matrix.
        inverted.select(col("doc_id").as("doc_a"), col("sh"))
          .join(c, Seq("doc_a"))
          .join(inverted.select(col("doc_id").as("doc_b"), col("sh")),
            Seq("doc_b", "sh"))
          .select(col("doc_a"), col("doc_b"))
    }
    // No hard-coded broadcast for the candidate/size lookups: both grow
    // with the corpus (one row per doc / per candidate pair), so pinning
    // them to broadcast is an OOM at real scale. AQE converts these to
    // broadcast joins at runtime when the actual built side is small —
    // the right call at every scale factor.
    shared
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_a", "n_sh" -> "n_a")), "doc_a")
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_b", "n_sh" -> "n_b")), "doc_b")
      .withColumn("jaccard",
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame =
    jaccardFromIndex(
      shingleIndex(docs, idCol, textCol, n, xxhash64(_)).cache(),
      threshold, candidates = None)

  /** MinHash+LSH near-dup pairs, verified with exact Jaccard.
    *
    * numHashes/bands control recall: collision prob for similarity s is
    * 1-(1-s^rows)^bands. Defaults (32 hashes, 16 bands of 2) catch
    * s=0.8 with p ~= 0.9998.
    *
    * Signature construction is RELATIONAL, not array-lambda: explode
    * shingles -> one codegen'd md5 per shingle -> groupBy(doc) with
    * `numHashes` partial-aggregated `min((a_i*h+b_i) mod p)` columns.
    * Higher-order-function lambdas are interpreted (CodegenFallback) in
    * Spark — the per-salt md5-in-a-lambda variant measured ~40us per
    * hash; this path computes ONE md5 per shingle inside whole-stage
    * codegen and turns the other 31 hashes into integer multiply-adds
    * folded into the aggregate. Map-side combine means the shuffle
    * carries one signature row per doc, not the shingles. */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      numHashes: Int = 32, bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, s"bands ($bands) must divide numHashes ($numHashes)")
    // Compact inverted index (doc_id, 32-bit md5-derived shingle hash)
    // — feeds the signature build AND the exact verify counting.
    val inverted = shingleIndex(docs, idCol, textCol, n, shingleHash32(_)).cache()
    val minAggs = minhashCoefficients(numHashes).zipWithIndex.map {
      case ((a, b), i) =>
        min((col("sh") * a + b) % MinhashPrime).as(s"m$i")
    }
    val sig = inverted.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
    val bandCols = (0 until bands).map { bd =>
      concat(lit(s"$bd|"), md5(concat_ws(",",
        (0 until rows).map(r => col(s"m${bd * rows + r}")): _*)))
    }
    val banded = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bucket"))
    // Same bucket in any band -> candidate (dedup across bands).
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // Exact Jaccard verify, relationally: count shared hashes for the
    // candidate pairs only (left-semi restriction) — no array columns.
    jaccardFromIndex(inverted, threshold, candidates = Some(candidates))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming (< 8).
    *
    * Candidates via the pigeonhole byte-band trick: split the 32-bit
    * sketch into 4 bytes; any pair within hamming 3 agrees on >= 1 whole
    * byte, so joining on (byte_index, byte_value) is exhaustive for
    * maxHamming <= 3 and never compares sketches across buckets. */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "byte-band candidate generation is exhaustive only for hamming <= 3")
    // Relational sketch construction (same pattern as the MinHash
    // signature): explode tokens -> one codegen'd md5 hash per token ->
    // groupBy(doc) with 32 static per-bit vote sums -> sketch assembled
    // in a plain projection. No array columns, no interpreted lambdas,
    // no cache barriers; the shuffle carries 32 longs per document with
    // map-side combine. (Zero-token documents drop out of the groupBy —
    // the synthetic corpus has none.)
    val hashed = docs.select(
      col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), tokenHash32(col("tok")).as("h"))
    val votes = (0 until 32).map { b =>
      sum((shiftright(col("h"), b) % 2) * 2 - 1).as(s"v$b")
    }
    val sketches = hashed.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
    val bandedBytes = sketches.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        concat(lit(s"$b|"),
          (shiftright(col("simhash"), 8 * b) % 256).cast("string"))): _*))
        .as("byte_band"))
    bandedBytes.as("a")
      .join(bandedBytes.as("b"),
        col("a.byte_band") === col("b.byte_band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming32(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
