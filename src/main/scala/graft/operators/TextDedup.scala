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

  /** Per-document distinct word n-gram shingle sets. */
  private def shingled(docs: DataFrame, idCol: String, textCol: String, n: Int) =
    docs.select(
      col(idCol).as("doc_id"),
      wordShingles(tokens(col(textCol)), n).as("shingles"))

  /** Exact Jaccard-similar pairs (doc_a < doc_b, jaccard >= threshold)
    * over word n-gram shingles, inverted-index join — no cross product.
    *
    * The join key is `xxhash64(shingle)`, not the shingle string: the
    * multi-word shingle averages ~20 bytes while the hash is 8, so the
    * exploded index shuffles less than half the bytes and the join
    * compares longs instead of strings. Distinct shingles per set means
    * a pair's matching hash count equals its matching shingle count
    * unless xxhash64 collides within one document's set (probability
    * ~|sh|^2/2^64 per doc — negligible, and confined to candidate
    * counting). */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sets = shingled(docs, idCol, textCol, n).cache()
    val sizes = sets.select(col("doc_id"), size(col("shingles")).as("n_sh"))
    val inverted = sets.select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
    val shared = inverted.as("a")
      .join(inverted.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_a", "n_sh" -> "n_a")), "doc_a")
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_b", "n_sh" -> "n_b")), "doc_b")
      .withColumn("jaccard",
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

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
    val sets = shingled(docs, idCol, textCol, n).cache()
    val hashed = sets
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .select(col("doc_id"), shingleHash32(col("s")).as("h"))
    val minAggs = minhashCoefficients(numHashes).zipWithIndex.map {
      case ((a, b), i) =>
        min((col("h") * a + b) % MinhashPrime).as(s"m$i")
    }
    val sig = hashed.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
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
    // Verify candidates with true Jaccard on the shingle sets.
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
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
    // Token md5s materialize behind a cache barrier so the 32-bit-vote
    // aggregate in simhash32 reads stored hashes instead of re-running
    // every md5 once per sketch bit (projection collapse would otherwise
    // inline them straight back into the lambda).
    val hashed = docs.select(
      col(idCol).as("doc_id"),
      tokenHashes(tokens(col(textCol))).as("hashes")).cache()
    val sketches = hashed.select(
      col("doc_id"),
      simhash32(col("hashes")).as("simhash")).cache()
    val bandedBytes = sketches.select(
      col("doc_id"), col("simhash"),
      explode(transform(sequence(lit(0), lit(3)),
        b => concat(b.cast("string"), lit("|"),
          byteAt(col("simhash"), b).cast("string"))))
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
