package graft

import java.nio.file.{Files, Paths}

/** Writes PLANS.md: formatted physical plans of the headline queries at
  * sf0.001, annotated with what to look for. Run after plan-affecting
  * changes: `sbt "runMain graft.Plans"`.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "graft-plans")
    val sf = "/root/testdata/sf0.001"
    val picks = Seq(
      "q01_pricing_summary" ->
        "partial+final HashAggregate, scan reads only the 8 needed columns",
      "q05_star_enrichment" ->
        "three BroadcastHashJoins (dims), fact side never exchanged before the joins",
      "q10_window_topn" ->
        "single hash partition on o_custkey feeding the window sort",
      "q22_minhash_lsh" ->
        "signature via partial-aggregated min() columns; bucket equi-join for candidates",
      "q25_knn_brute_force" ->
        "queries broadcast; corpus scanned once; partial top_k_by_score aggregate — no sort of scored pairs",
      "q28_sessionize" ->
        "one exchange on user_id reused by both window passes and the final aggregate",
      "q21_ngram_jaccard" ->
        "index = codegen'd word_shingles kernel + explode + hash, one distinct shuffle, no sort",
      "q40_asof_join" ->
        "union + single window over one user_id exchange — no range join, no subquery",
      "q41_interval_join" ->
        "banded candidates via hash equi-join on (user_id, band) — no cartesian/nested-loop",
      "q51_bm25" ->
        "postings filtered at the scan, broadcast df/stats, partial top_k_by_score — no sort",
      "q39_kmeans_ivf" ->
        "nearest_centroid as ONE referenced-matrix kernel call per side (plan O(1) in k); same-cluster hash equi-join",
      "q54_pack_contents" ->
        "per-shard window prefix sum + one partial-aggregated groupBy; per-bin lists bounded by the token budget",
      "q56_containment" ->
        "shared-shingle equi-join candidates, intersection counted relationally — no all-pairs",
      "q57_ngram_lm" ->
        "bigrams via one word_ngrams kernel + explode (no self-join); count joins AQE-decided; 1-row vocab broadcast",
      "q58_dedup_survivors" ->
        "cluster labels from checkpointed propagation; survivor via map-side-combined struct-max, no membership sort",
      "q61_crossmodal_dedup" ->
        "LSH pair chain + two id equi-joins to the embedding table; cosine via codegen'd float_dot, no extra shuffle shape",
      "q62_vocab_topk" ->
        "map-side-combined token counts into TakeOrderedAndProject — per-partition partial top-k, no global sort",
      "q66_repeated_spans" ->
        "all-positions window kernel + posexplode; distinct + count shuffles keyed on the 64-bit window hash; run merge windows one document per partition",
      "q67_corpus_sketch" ->
        "HLL++ partial aggregates (approx_count_distinct) beside exact mirrors; three 1-row aggregates fused by broadcast-ably tiny cross joins",
      "q70_semantic_dedup" ->
        "within-cell equi-join pairs; group labels joined back; survivor via map-side struct-min; centroid cosine joins a k-row broadcast",
      "q71_importance_resample" ->
        "one gram scan to a compact (doc,bucket,n) profile; bucket-bounded ratio broadcast; exact-decimal sums into TakeOrderedAndProject",
      "q73_pq_search" ->
        "codes via referenced-matrix nearest_centroid kernels (one per subspace); broadcast lookup table; hash equi-join on (s,c) into partial top_k_by_score",
      "q74_pq_search_ivf" ->
        "coarse-quantizer cell equi-join prunes the ADC to probed cells (cost ~ nprobe/k of the corpus); broadcast LUT; partial top_k_by_score",
      "q78_perplexity_buckets" ->
        "LM scoring chain into a score HISTOGRAM groupBy; tertile map broadcast-joined back — no global sort or single-partition window over corpus rows",
      "q80_source_cap" ->
        "partial top_k_by_score per source — <= cap rows per group cross the exchange, hot groups cost the same as any other, no per-group sort",
      "q82_quality_classifier" ->
        "scoring pass: ONE codegen map over the scan (classifier_score kernel, referenced weight array) — no explode, no join, no shuffle; the 100 TB filter shape",
      "q86_lsh_calibration" ->
        "one signature pass -> banded candidate equi-join -> bucket histogram; the analytic s-curve rides the same small aggregate",
      "q79_gopher_rules" ->
        "ONE gopher_measures kernel call per row inside the scan projection (no interpreted HOF lambdas); flags are comparisons over the struct fields",
      "q91_bloom_dedup" ->
        "bloom_might_contain routes as a map-tier predicate: the negatives branch is scan+filter only; exactly ONE join in the whole plan (the positives' exact confirm against the leased history hashes)",
      "q92_url_normalize" ->
        "pure projection over the scan — every canonicalization rule a codegen string function, zero Exchange at any corpus size",
      "q96_unigram_segment" ->
        "word-frequency aggregate feeds ONE unigram_segment kernel map (referenced model, plan O(1) in |V|) — segmentation adds no shuffle beyond the word count",
      "q101_source_overlap" ->
        "distinct (shingle-hash, source) frame self-joined on the hash — per-key fanout bounded by |sources|; totals broadcast back",
      "q104_hard_negatives" ->
        "queries (with cell ids) broadcast; ONE corpus pass scores cross-cell rows through referenced-matrix nearest_centroid + partial top_k_by_score — no shuffle of corpus rows",
      "q105_cdc_chunks" ->
        "token posexplode + window-gram cut set; per-doc running-sum window (one doc per partition); two hash-keyed aggregations — work tracks corpus tokens, never corpus^2",
      "q106_length_profile" ->
        "per-group ranking window; follow-up aggregate reuses the window's hash partitioning — one exchange total",
      "q117_kneser_ney" ->
        "one bigram scan feeds four vocabulary-sized count aggregates; scoring is left hash joins + one doc-keyed decimal-sum aggregate — no corpus^2 anywhere",
      "q121_c4_line_filter" ->
        "line posexplode with codegen'd per-line predicates (no interpreted lambda on the hot path); one doc-keyed aggregate with an order-pinned struct sort",
      "q124_winnowing" ->
        "positional gram hashes + ONE doc-partitioned sliding window (struct-min carries the rightmost-tie argmin) + hash-keyed rollups — no per-window subsort",
      "q127_char_entropy" ->
        "shuffle-free map tier: one codegen'd char_entropy kernel call per row, fused into the parquet scan",
      "q129_dedup_graph_profile" ->
        "LSH pair chain into two small keyed rollups (cluster sizes, size histogram) — label state rides the leased index, no corpus re-scan per rollup",
      "q130_quality_signals" ->
        "ONE WholeStageCodegen span over the scan: all six quality kernels fused into a single projection (PlanSpec-pinned)",
      "q135_pq_reconstruction" ->
        "one corpus map pass (per-subspace referenced-matrix kernels inside one exploded expression), then a |subspaces|-keyed rollup",
      "q136_chunk_reuse" ->
        "CDC cut windows per doc (one doc per partition), chunk hashes into hash-keyed aggregations — work tracks token mass + duplicate chunk mass",
      "q138_ann_artifact_search" ->
        "ARTIFACT-SERVED search: scan of the persisted codes parquet + broadcast query probes + broadcast ADC LUT — NO corpus encode kernel anywhere in the serving plan (PlanSpec-pinned)",
      "q139_quantizer_drift" ->
        "one referenced-matrix distance map pass per side + a 2-row aggregate — the retrain decision costs two scans, no shuffle beyond the final rollup",
      "q140_redact_pii" ->
        "pure projection: ordered regexp_replace chain fused into the scan, per-pattern counts from the RAW text column — zero Exchange",
      "q141_ann_codes_append" ->
        "weekly-cadence serving: UNION of per-batch code slices scanned as-is under the frozen read-back model; probes broadcast; partial top_k_by_score — encode cost per increment is the batch, never the corpus",
      "q143_quantile_report" ->
        "ONE documents scan melts both metrics; per-metric distinct-value histogram + bounded cumulative windows; the percentile pick is a broadcast NLJ over the HISTOGRAM — no corpus sort, no unpartitioned corpus window (PlanSpec-pinned)",
      "q144_line_dedup" ->
        "line posexplode (map tier) -> hash-df count (one shuffle) -> anti-join vs the few boilerplate keys (AQE broadcasts) -> per-doc ordered reassembly — work tracks corpus lines, never corpus^2",
      "q145_line_incremental" ->
        "weekly-cadence line dedup: history counts FILTERED to batch line keys by one equi-join before summing — per-increment work is batch lines + the key join, never the composed corpus",
      "q147_audio_neardup" ->
        "mapPartitions decode tier (per-partition codec init) -> fingerprint groupBy -> canonical equi-join back — the q20 survivor shape, candidates never pairwise",
      "q148_lowcard_rank" ->
        "LOW-cardinality (0..7) corpus rank: gopher_measures kernel in the scan projection; two-level __bnd histogram cumulatives; per-row window partitioned by (pass_ct, md5 tie bucket) — a corpus-sized tie group never sorts on one task",
      "q149_bm25_state" ->
        "serving scan of the composed postings state carries the bucket= partition filter (the probed terms' buckets only, never a corpus scan); df counted from the same pruned read; broadcast stats; partial top_k_by_score — no sort",
      "q150_lm_state" ->
        "both LM count-state scans (bg_counts_batch, prefix_counts_batch) carry bucket= partition filters derived from the QUERY's own grams/histories — per-query serving IO tracks the query, not the corpus vocabulary. At THIS entry's scale the INSET saturates all 32 buckets (the catalog query scores a whole held-out doc set, keys >> B — the honest min(1, keys/B) degrade, never more bytes); the sliver regime is LmStateSpec's short-query pin. Composed counts re-sum map-side; 1-row vocab broadcast")
    val sb = new StringBuilder
    sb.append("# PLANS — headline physical plans (generated by `graft.Plans`, sf0.001)\n")
    sb.append("\n_q137_curation_e2e has no plan artifact by construction: the entry " +
      "RUNS the pipeline eagerly (multiple sinks + audit counts) and returns a " +
      "local one-row stats frame; its stage plans are the q130/q66/q22/q70/q54 " +
      "shapes above composed, and its scale posture is audited per stage in " +
      "NOTES.md._\n")
    picks.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, sf)
      sb.append(s"\n## $name\n\n_${note}_\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"PLANS.md written (${picks.size} plans)")
    spark.stop()
  }
}
