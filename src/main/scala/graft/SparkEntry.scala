package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CoreQueries, ExtQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator catalog (one entry per SURVEY §2 cluster);
  * `oracleSql` holds the DuckDB-equivalent SQL for the driver's
  * correctness gate. Column names/aliases match pairwise by design.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q05StarEnrichment(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (CoreQueries.q01PricingSummary(_, _)),
    "q02_null_audit"      -> (CoreQueries.q02NullAudit(_, _)),
    "q03_distinct_union"  -> (CoreQueries.q03DistinctUnion(_, _)),
    "q04_antijoin_new_keys" -> (CoreQueries.q04AntijoinNewKeys(_, _)),
    "q05_star_enrichment" -> (CoreQueries.q05StarEnrichment(_, _)),
    "q06_datetime_dim"    -> (CoreQueries.q06DatetimeDim(_, _)),
    "q07_fact_prep"       -> (CoreQueries.q07FactPrep(_, _)),
    "q08_union_dedup"     -> (CoreQueries.q08UnionDedup(_, _)),
    "q09_top_orders"      -> (CoreQueries.q09TopOrders(_, _)),
    "q10_window_topn"     -> (CoreQueries.q10WindowTopn(_, _)),
    "q11_events_hourly"   -> (CoreQueries.q11EventsHourly(_, _)),
    "q12_string_funcs"    -> (CoreQueries.q12StringFuncs(_, _)),
    "q13_json_extract"    -> (CoreQueries.q13JsonExtract(_, _)),
    "q14_latest_event"    -> (CoreQueries.q14LatestEvent(_, _)),
    "q15_date_parse"      -> (CoreQueries.q15DateParse(_, _)),
    // Extension tier: LLM-data-pipeline operators (dedup, similarity
    // search, text analysis, multimodal) — BASELINE.json north star.
    "q16_token_count"       -> (ExtQueries.q16TokenCount(_, _)),
    "q17_quality_score"     -> (ExtQueries.q17QualityScore(_, _)),
    "q18_lang_id"           -> (ExtQueries.q18LangId(_, _)),
    "q19_fingerprint"       -> (ExtQueries.q19Fingerprint(_, _)),
    "q20_exact_dedup"       -> (ExtQueries.q20ExactDedup(_, _)),
    "q91_bloom_dedup"       -> (ExtQueries.q91BloomDedup(_, _)),
    "q92_url_normalize"     -> (ExtQueries.q92UrlNormalize(_, _)),
    "q93_html_extract"      -> (ExtQueries.q93HtmlExtract(_, _)),
    "q94_domain_cap"        -> (ExtQueries.q94DomainCap(_, _)),
    "q95_unigram_vocab"     -> (ExtQueries.q95UnigramVocab(_, _)),
    "q96_unigram_segment"   -> (ExtQueries.q96UnigramSegment(_, _)),
    "q21_ngram_jaccard"     -> (ExtQueries.q21NgramJaccard(_, _)),
    "q22_minhash_lsh"       -> (ExtQueries.q22MinhashLsh(_, _)),
    "q23_simhash"           -> (ExtQueries.q23Simhash(_, _)),
    "q56_containment"       -> (ExtQueries.q56Containment(_, _)),
    "q58_dedup_survivors"   -> (ExtQueries.q58DedupSurvivors(_, _)),
    "q60_dedup_report"      -> (ExtQueries.q60DedupReport(_, _)),
    "q61_crossmodal_dedup"  -> (ExtQueries.q61CrossModalDedup(_, _)),
    "q62_vocab_topk"        -> (ExtQueries.q62VocabTopk(_, _)),
    "q63_bpe_pairs"         -> (ExtQueries.q63BpePairs(_, _)),
    "q65_bpe_train"         -> (ExtQueries.q65BpeTrain(_, _)),
    "q66_repeated_spans"    -> (ExtQueries.q66RepeatedSpans(_, _)),
    "q67_corpus_sketch"     -> (ExtQueries.q67CorpusSketch(_, _)),
    "q68_bpe_segment"       -> (ExtQueries.q68BpeSegment(_, _)),
    "q69_remove_spans"      -> (ExtQueries.q69RemoveSpans(_, _)),
    "q24_embedding_neardup" -> (ExtQueries.q24EmbeddingNearDup(_, _)),
    "q25_knn_brute_force"   -> (ExtQueries.q25KnnBruteForce(_, _)),
    "q26_knn_lsh"           -> (ExtQueries.q26KnnLsh(_, _)),
    "q27_multimodal_stats"  -> (ExtQueries.q27MultimodalStats(_, _)),
    "q39_kmeans_ivf"        -> (ExtQueries.q39KmeansIvf(_, _)),
    "q45_knn_ivf"           -> (ExtQueries.q45KnnIvf(_, _)),
    "q55_kmeans_oversampled" -> (ExtQueries.q55KmeansOversampled(_, _)),
    "q70_semantic_dedup"    -> (ExtQueries.q70SemanticDedup(_, _)),
    "q75_semantic_dedup_guarded" -> (ExtQueries.q75SemanticDedupGuarded(_, _)),
    "q71_importance_resample" -> (ExtQueries.q71ImportanceResample(_, _)),
    "q73_pq_search"         -> (ExtQueries.q73PqSearch(_, _)),
    "q74_pq_search_ivf"     -> (ExtQueries.q74PqSearchIvf(_, _)),
    "q97_ivf_recall_sweep"  -> (ExtQueries.q97IvfRecallSweep(_, _)),
    "q76_media_decode"      -> (ExtQueries.q76MediaDecode(_, _)),
    "q89_image_neardup"     -> (ExtQueries.q89ImageNearDup(_, _)),
    "q90_video_framesample" -> (ExtQueries.q90VideoFrameSample(_, _)),
    "q77_bpe_vocab"         -> (ExtQueries.q77BpeVocab(_, _)),
    "q78_perplexity_buckets" -> (ExtQueries.q78PerplexityBuckets(_, _)),
    "q79_gopher_rules"      -> (ExtQueries.q79GopherRules(_, _)),
    "q80_source_cap"        -> (ExtQueries.q80SourceCap(_, _)),
    "q81_tokenizer_fertility" -> (ExtQueries.q81TokenizerFertility(_, _)),
    "q82_quality_classifier" -> (ExtQueries.q82QualityClassifier(_, _)),
    "q83_classifier_weights" -> (ExtQueries.q83ClassifierWeights(_, _)),
    "q84_corpus_datasheet"  -> (ExtQueries.q84CorpusDatasheet(_, _)),
    "q85_embedding_profile" -> (ExtQueries.q85EmbeddingProfile(_, _)),
    "q86_lsh_calibration"   -> (ExtQueries.q86LshCalibration(_, _)),
    "q87_dedup_threshold_sweep" -> (ExtQueries.q87DedupThresholdSweep(_, _)),
    "q28_sessionize"        -> (ExtQueries.q28Sessionize(_, _)),
    "q40_asof_join"         -> (ExtQueries.q40AsofJoin(_, _)),
    "q41_interval_join"     -> (ExtQueries.q41IntervalJoin(_, _)),
    "q42_redact"            -> (ExtQueries.q42Redact(_, _)),
    "q43_repetition"        -> (ExtQueries.q43Repetition(_, _)),
    "q44_minhash_estimate"  -> (ExtQueries.q44MinhashEstimate(_, _)),
    "q46_normalize"         -> (ExtQueries.q46Normalize(_, _)),
    "q47_decontaminate"     -> (ExtQueries.q47Decontaminate(_, _)),
    "q88_decon_audit"       -> (ExtQueries.q88DeconAudit(_, _)),
    "q48_stratified_sample" -> (ExtQueries.q48StratifiedSample(_, _)),
    "q64_token_budget_mix"  -> (ExtQueries.q64TokenBudgetMix(_, _)),
    "q49_pack_sequences"    -> (ExtQueries.q49PackSequences(_, _)),
    "q54_pack_contents"     -> (ExtQueries.q54PackContents(_, _)),
    "q72_shard_manifest"    -> (ExtQueries.q72ShardManifest(_, _)),
    "q57_ngram_lm"          -> (ExtQueries.q57NgramLm(_, _)),
    "q59_ngram_lm_heldout"  -> (ExtQueries.q59NgramLmHeldout(_, _)),
    "q117_kneser_ney"       -> (ExtQueries.q117KneserNey(_, _)),
    "q50_chunk_documents"   -> (ExtQueries.q50ChunkDocuments(_, _)),
    "q51_bm25"              -> (ExtQueries.q51Bm25(_, _)),
    "q52_hybrid_rrf"        -> (ExtQueries.q52HybridRrf(_, _)),
    "q53_dedup_clusters"    -> (ExtQueries.q53DedupClusters(_, _)),
    "q98_leakage_safe_split" -> (ExtQueries.q98LeakageSafeSplit(_, _)),
    "q99_epoch_mix"         -> (ExtQueries.q99EpochMix(_, _)),
    "q100_decon_spans"      -> (ExtQueries.q100DeconSpans(_, _)),
    "q101_source_overlap"   -> (ExtQueries.q101SourceOverlap(_, _)),
    "q102_temperature_mix"  -> (ExtQueries.q102TemperatureMix(_, _)),
    "q103_balanced_shards"  -> (ExtQueries.q103BalancedShards(_, _)),
    "q104_hard_negatives"   -> (ExtQueries.q104HardNegatives(_, _)),
    "q105_cdc_chunks"       -> (ExtQueries.q105CdcChunks(_, _)),
    "q106_length_profile"   -> (ExtQueries.q106LengthProfile(_, _)),
    "q107_packing_efficiency" -> (ExtQueries.q107PackingEfficiency(_, _)),
    "q108_classifier_calibration" -> (ExtQueries.q108ClassifierCalibration(_, _)),
    "q109_tokenizer_compare" -> (ExtQueries.q109TokenizerCompare(_, _)),
    "q110_epoch_plan"       -> (ExtQueries.q110EpochPlan(_, _)),
    "q111_dedup_savings"    -> (ExtQueries.q111DedupSavings(_, _)),
    "q112_mix_drift"        -> (ExtQueries.q112MixDrift(_, _)),
    "q113_contrastive_pairs" -> (ExtQueries.q113ContrastivePairs(_, _)),
    "q114_split_audit"      -> (ExtQueries.q114SplitAudit(_, _)),
    "q115_curriculum_order" -> (ExtQueries.q115CurriculumOrder(_, _)),
    "q116_ann_method_compare" -> (ExtQueries.q116AnnMethodCompare(_, _)),
    "q118_retrieval_metrics" -> (ExtQueries.q118RetrievalMetrics(_, _)),
    "q119_snapshot_diff"    -> (ExtQueries.q119SnapshotDiff(_, _)),
    "q120_random_projection" -> (ExtQueries.q120RandomProjection(_, _)),
    "q121_c4_line_filter"   -> (ExtQueries.q121C4LineFilter(_, _)),
    "q122_collocations"     -> (ExtQueries.q122Collocations(_, _)),
    "q123_projected_ann_eval" -> (ExtQueries.q123ProjectedAnnEval(_, _)),
    "q124_winnowing"        -> (ExtQueries.q124Winnowing(_, _)),
    "q125_vocab_growth"     -> (ExtQueries.q125VocabGrowth(_, _)),
    "q126_soft_dedup"       -> (ExtQueries.q126SoftDedup(_, _)),
    "q127_char_entropy"     -> (ExtQueries.q127CharEntropy(_, _)),
    "q128_session_transcripts" -> (ExtQueries.q128SessionTranscripts(_, _)),
    "q129_dedup_graph_profile" -> (ExtQueries.q129DedupGraphProfile(_, _)),
    "q130_quality_signals"  -> (ExtQueries.q130QualitySignals(_, _)),
    "q131_embedding_drift"  -> (ExtQueries.q131EmbeddingDrift(_, _)),
    "q132_stupid_backoff"   -> (ExtQueries.q132StupidBackoff(_, _)),
    "q133_length_batching"  -> (ExtQueries.q133LengthBatching(_, _)),
    "q134_token_runs"       -> (ExtQueries.q134TokenRuns(_, _)),
    "q135_pq_reconstruction" -> (ExtQueries.q135PqReconstruction(_, _)),
    "q136_chunk_reuse"      -> (ExtQueries.q136ChunkReuse(_, _)),
    "q137_curation_e2e"     -> (ExtQueries.q137CurationE2e(_, _)),
    "q138_ann_artifact_search" -> (ExtQueries.q138AnnArtifactSearch(_, _)),
    "q139_quantizer_drift"  -> (ExtQueries.q139QuantizerDrift(_, _)),
    "q140_redact_pii"       -> (ExtQueries.q140RedactPii(_, _)),
    "q141_ann_codes_append" -> (ExtQueries.q141AnnCodesAppend(_, _)),
    "q142_span_incremental" -> (ExtQueries.q142SpanIncremental(_, _)),
    "q143_quantile_report"  -> (ExtQueries.q143QuantileReport(_, _)),
    "q144_line_dedup"       -> (ExtQueries.q144LineDedup(_, _)),
    "q145_line_incremental" -> (ExtQueries.q145LineIncremental(_, _)),
    "q146_cadence_e2e"      -> (ExtQueries.q146CadenceE2e(_, _)),
    "q147_audio_neardup"    -> (ExtQueries.q147AudioNearDup(_, _)),
    "q148_lowcard_rank"     -> (ExtQueries.q148LowCardRank(_, _)),
    "q149_bm25_state"       -> (ExtQueries.q149Bm25State(_, _)),
    "q150_lm_state"         -> (ExtQueries.q150LmState(_, _)),
    "q32_curation_pipeline" -> (ExtQueries.q32CurationPipeline(_, _)),
    // Analytics tier: TPC-H-style BI shapes (the reference's
    // BigQuery/Looker layer, SURVEY.md §2.4 note).
    "q29_shipping_priority" -> (AnalyticsQueries.q29ShippingPriority(_, _)),
    "q30_local_volume"      -> (AnalyticsQueries.q30LocalVolume(_, _)),
    "q31_promo_share"       -> (AnalyticsQueries.q31PromoShare(_, _)),
    "q33_rollup"            -> (AnalyticsQueries.q33Rollup(_, _)),
    "q34_pivot"             -> (AnalyticsQueries.q34Pivot(_, _)),
    "q35_stats"             -> (AnalyticsQueries.q35Stats(_, _)),
    "q36_rolling"           -> (AnalyticsQueries.q36Rolling(_, _)),
    "q37_semi_join"         -> (AnalyticsQueries.q37SemiJoin(_, _)),
    "q38_set_ops"           -> (AnalyticsQueries.q38SetOps(_, _)),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_null_audit" ->
      """SELECT
        | CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_orderkey,
        | CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_partkey,
        | CAST(sum(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_suppkey,
        | CAST(sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_linenumber,
        | CAST(sum(CASE WHEN l_quantity IS NULL OR isnan(l_quantity) THEN 1 ELSE 0 END) AS BIGINT) AS l_quantity,
        | CAST(sum(CASE WHEN l_extendedprice IS NULL OR isnan(l_extendedprice) THEN 1 ELSE 0 END) AS BIGINT) AS l_extendedprice,
        | CAST(sum(CASE WHEN l_discount IS NULL OR isnan(l_discount) THEN 1 ELSE 0 END) AS BIGINT) AS l_discount,
        | CAST(sum(CASE WHEN l_tax IS NULL OR isnan(l_tax) THEN 1 ELSE 0 END) AS BIGINT) AS l_tax,
        | CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_returnflag,
        | CAST(sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_linestatus,
        | CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_shipdate
        |FROM lineitem""".stripMargin,

    "q03_distinct_union" ->
      """SELECT DISTINCT l_partkey AS item_key FROM lineitem
        |UNION
        |SELECT l_suppkey FROM lineitem""".stripMargin,

    "q04_antijoin_new_keys" ->
      """SELECT DISTINCT CAST(o_custkey AS BIGINT) AS new_key
        |FROM orders
        |WHERE o_custkey IS NOT NULL
        |  AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 1000.0)""".stripMargin,

    "q05_star_enrichment" ->
      """SELECT r_name, n_name,
        | count(*) AS n_items,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q06_datetime_dim" ->
      """SELECT datetime_id,
        | CAST(year(datetime_id) AS INT) AS year,
        | CAST(dayofweek(datetime_id) + 1 AS INT) AS week_day,
        | CAST(month(datetime_id) AS INT) AS month,
        | CAST(day(datetime_id) AS INT) AS day,
        | CAST(hour(datetime_id) AS INT) AS hour,
        | CAST(minute(datetime_id) AS INT) AS minute,
        | CAST(second(datetime_id) AS INT) AS second
        |FROM (SELECT o_orderdate AS datetime_id FROM orders
        |      UNION
        |      SELECT l_shipdate FROM lineitem)
        |WHERE datetime_id IS NOT NULL""".stripMargin,

    "q07_fact_prep" ->
      """SELECT o_orderkey AS rental_id,
        | CAST(o_custkey AS BIGINT) AS customer_id,
        | o_orderdate AS start_ts,
        | CAST(o_orderdate AS DATE) AS weather_date,
        | CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END AS is_large,
        | CAST(0.0 AS DOUBLE) AS placeholder_coord
        |FROM orders
        |WHERE o_orderdate IS NOT NULL AND o_custkey IS NOT NULL""".stripMargin,

    "q08_union_dedup" ->
      """SELECT entity_id, name, src FROM (
        | SELECT c_custkey AS entity_id, c_name AS name, 'customer' AS src FROM customer
        | UNION ALL
        | SELECT s_suppkey, s_name, 'supplier' FROM supplier)
        |QUALIFY row_number() OVER (PARTITION BY entity_id ORDER BY src, name) = 1""".stripMargin,

    "q09_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q10_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |FROM orders
        |QUALIFY rn <= 3""".stripMargin,

    "q11_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        | count(*) AS n_events,
        | round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    "q12_string_funcs" ->
      """SELECT p_partkey,
        | upper(p_brand) AS brand_u,
        | CAST(length(p_name) AS INT) AS name_len,
        | split_part(p_type, ' ', 1) AS type_head,
        | string_split(p_name, ' ')[-1] AS name_tail,
        | regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
        | concat_ws('-', p_brand, p_type) AS brand_type
        |FROM part""".stripMargin,

    "q13_json_extract" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events""".stripMargin,

    "q14_latest_event" ->
      """SELECT user_id,
        | max(ts) AS last_ts,
        | max_by(event_type, ts) AS last_event_type,
        | count(*) AS n_events
        |FROM events GROUP BY user_id""".stripMargin,

    "q15_date_parse" ->
      """SELECT o_orderkey,
        | strptime(strftime(o_orderdate, '%d/%m/%Y %H:%M'), '%d/%m/%Y %H:%M') AS parsed_ts,
        | CAST(strptime(strftime(o_orderdate, '%d%b%Y'), '%d%b%Y') AS DATE) AS parsed_date
        |FROM orders""".stripMargin,
  ) ++ ExtQueries.oracleSql ++ AnalyticsQueries.oracleSql
}
