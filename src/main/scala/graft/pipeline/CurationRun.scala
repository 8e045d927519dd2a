package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DataMix, TextAnalysis, TextDedup}
import graft.sources.Sinks

/** End-to-end training-data curation run — the extension tier's
  * [[Runner]] analogue: one call takes a raw document corpus plus a
  * benchmark set and lands a cleaned, deduplicated, decontaminated,
  * language-sampled corpus and its packed-sequence bins as parquet.
  *
  * Stage order is the one that minimizes downstream work: cheap map
  * passes (normalize, redact) first, then the quality gate (shrinks
  * everything after), decontamination (equi-join against the broadcast
  * benchmark shingle set), near-dup clustering + quality-survivor
  * selection over the survivors only (the [[DedupSuite]] shared
  * artifacts — built once on the gated corpus), deterministic
  * language-stratified sampling, and finally sequence packing over
  * exactly the kept text. Every stage is an independently
  * oracle-verified operator (q46/q42/q17/q47/q53/q58/q48/q54) —
  * composition is the only thing this adds, like q32/q60 at catalog
  * scale.
  *
  * All joins are key equi-joins; nothing here collects data to the
  * driver (the run returns row COUNTS per stage — each an aggregate —
  * as the audit trail a production run logs).
  */
object CurationRun {

  /** Drive the full pass over a testdata SF dir (benchmark = the q47
    * split: every 97th doc):
    * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.pipeline.CurationRun"` */
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-curation-run")
    val docs = graft.Tables.documents(spark, dir)
    val t0 = System.nanoTime()
    val stats = run(
      docs.where(pmod(col("doc_id"), lit(97)) =!= 0),
      docs.where(pmod(col("doc_id"), lit(97)) === 0),
      "/tmp/graft_curation_out",
      minContaminatedShingles =
        sys.env.getOrElse("SPARK_GRAFT_DECON_MIN", "5").toInt)
    println(f"curation run: ${(System.nanoTime() - t0) / 1e9}%.1f s  $stats")
    spark.stop()
  }

  final case class Stats(
    input: Long, gated: Long, decontaminated: Long,
    kept: Long, sampled: Long, bins: Long)

  /** Survivor keep set over the decontaminated corpus: near-dup
    * clusters from the suite's shared artifacts, quality-best survivor
    * per cluster, unclustered docs keep themselves. Returns a PERSISTED
    * and MATERIALIZED frame plus its count — materialized while the
    * suite's artifacts are still cached, so the survivors join reads
    * the suite's quality frame from cache instead of recomputing it
    * from lineage after `suite.close()` unpersists (VERDICT r04 item
    * 2: a lazy persist here is correct but forfeits exactly the
    * shared-artifact amortization the suite exists for). The caller
    * may close the suite as soon as this returns. */
  def keepSet(suite: DedupSuite, decon: DataFrame,
      dedupThreshold: Double): (DataFrame, Long) = {
    val clusters = suite.clusters(dedupThreshold)
    val survivors = suite.survivors(clusters)
      .select(col("canonical_id"), col("survivor_id"))
    val k = decon
      .join(clusters, Seq("doc_id"), "left")
      .join(survivors, Seq("canonical_id"), "left")
      .where(col("survivor_id").isNull || col("survivor_id") === col("doc_id"))
      .select(col("doc_id"), col("text"), col("quality_score"))
      .persist() // feeds lang-id, the sample, packing, and the sink
    (k, k.count()) // eager: materializes the cache; doubles as the audit stat
  }

  /** Run the pass; outputs land under `outDir` as `curated/` (doc_id,
    * text, detected_lang, quality_score) and `packed/` (per-bin member
    * ids + packed text). Overwrite semantics — re-runs are idempotent. */
  def run(docs: DataFrame, benchmark: DataFrame, outDir: String,
      minQuality: Double = 0.5, dedupThreshold: Double = 0.25,
      minContaminatedShingles: Int = 1,
      fractions: Map[String, Double] = Map.empty, defaultFraction: Double = 1.0,
      packBudget: Long = 4096L, packShards: Int = 8): Stats = {
    val spark = docs.sparkSession

    // Map tier: canonicalize then strip PII/URLs.
    val normalized = TextAnalysis.normalize(docs, "doc_id", "text")
      .select(col("doc_id"), col("norm_text").as("text"))
    val redacted = TextAnalysis.redact(normalized, "doc_id", "text")
      .select(col("doc_id"), col("clean_text").as("text"))

    // Quality gate: keep the score for the survivor pick + audit.
    val quality = TextAnalysis.qualityScore(redacted, "doc_id", "text")
      .select(col("doc_id"), col("quality_score"))
    val gated = redacted
      .join(quality.where(col("quality_score") >= minQuality), "doc_id")

    // Benchmark decontamination (left-anti against the flagged set).
    // The overlap floor matters on corpora with a dense shared
    // vocabulary: at ANY-shared-shingle strictness the synthetic sf0.1
    // corpus loses 94% of itself to a 51-doc benchmark split; real
    // pipelines tune the floor to the benchmark's phrase specificity.
    val decon = gated.join(
      TextDedup.contaminated(gated, benchmark, "doc_id", "text", n = 3)
        .where(col("n_contaminated_shingles") >= minContaminatedShingles)
        .select(col("doc_id")),
      Seq("doc_id"), "left_anti")
      .persist() // read by the suite build, clustering, and the keep join

    // Near-dup dedup over the decontaminated corpus: shared artifacts,
    // quality-best survivor per cluster, unclustered docs keep
    // themselves. MinHash at a low threshold subsumes exact dups
    // (identical signatures collide in every band).
    val suite = DedupSuite(decon, "doc_id", "text", n = 3)
    val (kept, keptCount) = try keepSet(suite, decon, dedupThreshold)
      finally suite.close()

    // Deterministic language-stratified mix.
    val lang = TextAnalysis.languageId(kept, "doc_id", "text")
      .select(col("doc_id"), col("detected_lang"))
    val sampled = DataMix.stratifiedSample(
      kept.join(lang, "doc_id"), "doc_id", "detected_lang",
      fractions, defaultFraction)

    // Land the curated corpus and its packed bins.
    import graft.functions.TextFunctions.tokens
    val curated = sampled
      .select(col("doc_id"), col("text"), col("detected_lang"), col("quality_score"))
    Sinks.overwriteParquet(curated, s"$outDir/curated", numFiles = 4)
    val packed = DataMix.packSequenceContents(
      curated.select(col("doc_id"), col("text"),
        size(tokens(col("text"))).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", "text", budget = packBudget, shards = packShards)
    Sinks.overwriteParquet(packed, s"$outDir/packed", numFiles = 1)

    val stats = Stats(
      input = docs.count(), gated = gated.count(),
      decontaminated = decon.count(), kept = keptCount,
      sampled = spark.read.parquet(s"$outDir/curated").count(),
      bins = spark.read.parquet(s"$outDir/packed").count())
    decon.unpersist(); kept.unpersist()
    stats
  }
}
