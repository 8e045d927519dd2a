package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus composition operators for training-data pipelines: mixing
  * (stratified sampling) and sequence packing. Both are deterministic
  * by construction — md5-derived sampling buckets and doc-id-ordered
  * prefix sums — so identical inputs produce identical corpora on any
  * engine or cluster (and the DuckDB oracle can replay them).
  */
object DataMix {

  /** Uniform [0, 1e6) sampling bucket from the row id — md5-derived,
    * so any engine reproduces the same draw for the same id. */
  private def bucket(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000000L

  /** Deterministic stratified sample: keep a row iff its md5 bucket
    * falls under its stratum's fraction. The workhorse of data
    * mixing — upsample/downsample strata (language, source, quality
    * band) to a target composition. Pure map pass: no shuffle, no
    * RNG state, reproducible under retries and partition reshuffles
    * (the classic failure of `rand()`-based sampling at scale). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], default: Double): DataFrame =
    df.where(sampleKeepExpr(col(idCol), col(stratumCol), fractions, default))

  /** The [[stratifiedSample]] keep PREDICATE as a column — shared with
    * [[graft.pipeline.PublishState]]'s per-doc ledger so the delta
    * publisher's membership flags replay the sample's exact draw
    * (same md5 bucket, same fraction fold) rather than a parallel
    * reimplementation that could drift. */
  def sampleKeepExpr(id: Column, stratum: Column,
      fractions: Map[String, Double], default: Double): Column = {
    val frac = fractions.foldLeft(lit(default)) { case (els, (k, f)) =>
      when(stratum === k, lit(f)).otherwise(els)
    }
    bucket(id) < (frac * 1000000L).cast("long")
  }

  /** Token-BUDGET stratified sample: keep documents, in the
    * deterministic md5 pseudo-random order, until each stratum's token
    * budget fills — how pretraining mixes are actually specified
    * (tokens per domain/language, not keep fractions). A document is
    * kept iff the tokens BEFORE it in its stratum's order are under
    * the budget, so the crossing document is included and the fill
    * overshoots by less than one document.
    *
    * Scale shape: the naive form is one window per stratum — a
    * single-partition sort of the dominant stratum (billions of rows
    * at corpus scale). Instead, prefix sums are two-level: rows
    * bucket by their md5's leading 12 bits (bucket order IS
    * md5-order, so results are identical to the global-order form the
    * oracle runs); per-(stratum, bucket) token totals — a strata*4096-
    * row frame — get exclusive bucket offsets from a tiny window, and
    * the per-row window runs per (stratum, bucket) partition. No
    * partition exceeds ~1/4096 of its stratum; the offsets join is
    * AQE-broadcast. */
  def tokenBudgetSample(df: DataFrame, idCol: String, stratumCol: String,
      nTokensCol: String, budgets: Map[String, Long], default: Long): DataFrame = {
    val budget = budgets.foldLeft(lit(default)) { case (els, (k, b)) =>
      when(col(stratumCol) === k, lit(b)).otherwise(els)
    }
    val d = df
      .withColumn("__ord", md5(col(idCol).cast("string")))
      .withColumn("__bkt", substring(col("__ord"), 1, 3))
    // __bnd rename: the per-stratum offset cumulative runs over the
    // strata x 4096-bucket aggregate — bounded frame, declared for
    // graft.WindowTripwire and the PlanSpec catalog sweep (without the
    // marker this reads as a single-key window on the LANGUAGE column,
    // indistinguishable from the q103 hazard class it is not in).
    val offsets = d.groupBy(col(stratumCol), col("__bkt"))
      .agg(sum(col(nTokensCol)).as("__bnd_btok"))
      .withColumn("__offset", coalesce(sum(col("__bnd_btok")).over(
        Window.partitionBy(col(stratumCol)).orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__bnd_btok")
    val w = Window.partitionBy(col(stratumCol), col("__bkt"))
      .orderBy(col("__ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(offsets, Seq(stratumCol, "__bkt"))
      .withColumn("__prefix",
        col("__offset") + coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .where(col("__prefix") < budget)
      .drop("__ord", "__bkt", "__offset", "__prefix")
  }

  /** Sequence packing: assign documents to fixed-token-budget bins,
    * the pretraining batch-construction step. Documents are sharded
    * (deterministically, by id) and packed within each shard in id
    * order by exclusive prefix sum: bin = floor(prefix / budget).
    *
    * Sharding is the scale story: a single global packing order would
    * serialize into one sort partition; per-shard packing runs one
    * window per shard partition in parallel and is how packing is
    * actually run on large corpora (each shard feeds its own workers).
    * Returns per-(shard, bin) composition stats. */
  def packSequences(docs: DataFrame, idCol: String, nTokensCol: String,
      budget: Long, shards: Int): DataFrame =
    withBins(docs, idCol, nTokensCol, budget, shards)
      .groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(nTokensCol)).as("total_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))

  /** Length-bucketed dynamic batching — the bucketed-batching plan
    * every variable-length trainer runs (pad each batch to its bucket
    * bound; batch size = token budget div bound, so every batch costs
    * ~the same compute regardless of sequence length; the alternative
    * to [[packSequences]]' concatenation when documents must stay
    * unconcatenated, e.g. SFT): each document lands in the smallest
    * power-of-two band >= its token count, and band-local ranks cut
    * fixed-capacity batches.
    *
    * Band bounds come from a broadcast 21-row powers-of-two table —
    * NO pow/log2 (libm is least trustworthy exactly at the power
    * boundaries this op cares about). Band-local ranks come from
    * [[graft.operators.Ranking.groupedRank]] (per-(band, nt) histogram
    * + bounded cumulative + tie-group row_number) — a window
    * partitioned by the <= 21-value band key would put a dominant
    * band's every row on one task at corpus scale, the same hazard
    * class as the unpartitioned q108 window, just invisible to the
    * tripwire.
    *
    * Row contract (ADVICE r06): docs with `nt < 1` are EXCLUDED (a
    * zero-length doc has no batch slot; a NULL nt fails the same
    * declared `nt >= 1` filter — exclusion is this row contract, not
    * a silent join artifact); docs with `nt > 2^20` CLAMP
    * into the top band (band = 2^20, capacity >= 1) rather than
    * silently dropping — at corpus scale a handful of pathological
    * mega-documents must still land in the plan, in the band whose
    * capacity math already treats them as "one doc per batch". */
  def lengthBatching(docs: DataFrame, idCol: String, nTokensCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, "budget must be positive")
    val spark = docs.sparkSession
    val topBand = 1L << 20
    val powers = broadcast(spark.range(0, 21)
      .select(expr("CAST(1 AS BIGINT) << CAST(id AS INT)").as("p2")))
    val banded = docs
      .select(col(idCol).as("doc_id"), col(nTokensCol).cast("long").as("nt"))
      .where(col("nt") >= 1)
      .join(powers, col("p2") >= least(col("nt"), lit(topBand)))
      .groupBy(col("doc_id"), col("nt")).agg(min(col("p2")).as("band"))
    Ranking.groupedRank(banded, Seq("band"), "nt", "doc_id", "rank",
        descending = true)
      .withColumn("capacity", greatest(expr(s"${budget}L div band"), lit(1L)))
      .select(col("doc_id"), col("nt"), col("band"), col("capacity"),
        expr("(CAST(rank AS BIGINT) - 1) div capacity").as("batch_id"))
  }

  /** Shared (shard, prefix, bin) assignment for the packing family. */
  private def withBins(docs: DataFrame, idCol: String, nTokensCol: String,
      budget: Long, shards: Int): DataFrame =
    withBinsBy(docs, idCol, nTokensCol, budget,
      (col(idCol) % shards).cast("int"))

  /** [[withBins]] under a caller-supplied shard expression — the
    * cadence publish shards by id RANGE (`doc_id div span`) so a
    * monotonic-id weekly batch lands in its OWN new shards instead of
    * spraying one doc into every modulo shard (which would mark the
    * whole publish changed every week and defeat the delta carry). */
  private def withBinsBy(docs: DataFrame, idCol: String, nTokensCol: String,
      budget: Long, shardOf: Column): DataFrame = {
    require(budget > 0, "budget must be positive")
    // "__ent_shard": the per-shard packing window is bounded by
    // caller-sized parallelism (modulo form) or the id-range span —
    // marker-sanctioned (VERDICT r09 item 2); renamed back before
    // callers group on it.
    val w = Window.partitionBy(col("__ent_shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("__ent_shard", shardOf)
      .withColumn("prefix",
        coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("prefix") / budget))
      // withColumn (not a rename): an input that already carries a
      // `shard` column keeps the old replace-in-place contract instead
      // of gaining an ambiguous duplicate.
      .withColumn("shard", col("__ent_shard"))
      .drop("__ent_shard")
  }

  /** Packed-sequence CONTENTS — the output a training-data writer
    * consumes (VERDICT r03 missing #1): one row per (shard, bin) with
    * the member doc ids in packing order (comma-joined string — a
    * cross-engine-stable encoding) and the documents' text concatenated
    * in the same order, plus the composition stats.
    *
    * Scale shape: identical to [[packSequences]] (per-shard window +
    * one groupBy); the per-bin collect_list is bounded by the token
    * budget (a bin holds at most ~budget tokens of text), so no group
    * can blow up regardless of corpus size. The sort_array/transform
    * post-processing runs once per BIN over that bounded list, not per
    * document. */
  def packSequenceContents(docs: DataFrame, idCol: String, nTokensCol: String,
      textCol: String, budget: Long, shards: Int): DataFrame =
    packSequenceContentsBy(docs, idCol, nTokensCol, textCol, budget,
      (col(idCol) % shards).cast("int"))

  /** [[packSequenceContents]] under a caller-supplied shard
    * expression (see [[withBinsBy]] — the cadence publish's
    * range-sharded form). */
  def packSequenceContentsBy(docs: DataFrame, idCol: String,
      nTokensCol: String, textCol: String, budget: Long,
      shardOf: Column): DataFrame =
    withBinsBy(docs, idCol, nTokensCol, budget, shardOf)
      .groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(nTokensCol)).as("total_tokens"),
        array_join(sort_array(collect_list(col(idCol))).cast("array<string>"), ",")
          .as("doc_ids"),
        array_join(
          transform(
            sort_array(collect_list(struct(col(idCol).as("i"), col(textCol).as("t")))),
            x => x.getField("t")),
          "\n").as("packed_text"))

  /** Writer-side shard manifest over a packed corpus
    * ([[packSequenceContents]] output): one row per output shard with
    * bin/doc/token totals and an order-invariant content checksum
    * (exact long sum of per-bin packed-text hashes) — the record a
    * distributed write job publishes so downstream loaders can
    * validate shards without re-reading the text. One map pass over
    * bins into a shards-row aggregate; the checksum is a sum, so it
    * is independent of task/partition order by construction. */
  def shardManifest(packed: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.shingleHash32
    packed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"),
        sum(shingleHash32(col("packed_text"))).as("checksum"))
  }

  /** DSIR-style importance resampling (public technique: Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling"): select raw documents whose hashed-n-gram profile
    * looks like a small TARGET corpus. Features are word unigrams +
    * bigrams hashed into `buckets` md5 buckets; each bucket carries
    * its add-one-smoothed log-ratio `ln p_target(b) - ln p_raw(b)`;
    * a document's log-importance is the sum of its grams' bucket
    * ratios; and `take` documents are drawn WITHOUT replacement,
    * with probability proportional to importance, via the Gumbel
    * top-k trick — the noise is md5-derived, so the whole draw is
    * deterministic and the DuckDB oracle replays it.
    *
    * Determinism discipline (NOTES finding #18): per-bucket ratios
    * are rounded to 8dp and summed as exact DECIMALs (the per-bucket
    * gram count multiplies a DECIMAL(10,0), keeping the product
    * exact); the Gumbel noise is itself 8dp-rounded before the
    * decimal add; ordering happens on the exact decimal key, and
    * doubles appear only in the rounded output columns.
    *
    * Scale shape: ONE gram scan of the raw corpus collapses to the
    * compact (doc_id, bucket, n) frame, persisted under an
    * action-scoped [[CacheLease]] for its two consumers (bucket
    * marginals + per-doc scoring); the ratio table is at most
    * `buckets` rows — a parameter, not a corpus-scaled frame — and is
    * explicitly broadcast; the final cut is orderBy+limit, which
    * plans as TakeOrderedAndProject (per-partition partial top-k,
    * `take` rows cross the exchange — no global sort). */
  /** Batch-trained importance distributions ([[importanceResample]]'s
    * per-bucket smoothed log-ratios) — at most `buckets` rows. The
    * caller owns the cache lifecycle, like
    * [[graft.operators.TextAnalysis.LmStats]]: persist before reuse
    * across scoring calls (or across micro-batches of the streaming
    * twin, [[graft.streaming.StreamImportance]]), unpersist when done. */
  final case class ImportanceStats(ratio: DataFrame, buckets: Int) {
    def persist(): this.type = { ratio.persist(); this }
    def unpersist(blocking: Boolean = false): this.type = {
      ratio.unpersist(blocking); this
    }
  }

  /** md5 feature-hash bucket of a gram (shared by the batch operator
    * and the streaming twin — ONE feature definition). */
  private[graft] def gramBucket(g: Column, buckets: Int): Column = {
    import graft.functions.TextFunctions.shingleHash32
    shingleHash32(g) % buckets
  }

  /** (doc_id, bucket, n) profile of a document frame under the
    * unigram+bigram feature hash. Shared with the fastText-style
    * [[QualityClassifier]], which learns weights over exactly this
    * feature space. */
  private[operators] def docBuckets(df: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame = {
    import graft.functions.TextFunctions.{tokens, wordNgramsNative}
    val toks = tokens(col(textCol))
    df.select(col(idCol).as("doc_id"),
        explode(concat(toks, wordNgramsNative(toks, 2))).as("g"))
      .withColumn("b", gramBucket(col("g"), buckets))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
  }

  /** Per-bucket add-one-smoothed log-ratio `ln p_target - ln p_raw`
    * from the two bucket profiles, 8dp-rounded into exact DECIMALs. */
  private def bucketRatios(rawB: DataFrame, tgtB: DataFrame,
      buckets: Int): DataFrame =
    ratiosFromCounts(
      rawB.groupBy(col("b")).agg(sum(col("n")).as("cr")),
      tgtB.groupBy(col("b")).agg(sum(col("n")).as("ct")), buckets)

  /** The ratio computation from PRE-AGGREGATED per-bucket counts —
    * the incremental-cadence entry point: bucket counts are ADDITIVE,
    * so a weekly batch writes its own (b, cr) slice and the composed
    * statistics come from summing slices (see
    * [[importanceTrainFromCounts]]), never from re-scanning old
    * batches' text. */
  private def ratiosFromCounts(rawAgg: DataFrame, tgtAgg: DataFrame,
      buckets: Int): DataFrame = {
    val tgt = tgtAgg
    val rawC = rawAgg
    // 1-row totals ride a broadcast literal-key join (the LmStats
    // vocab pattern) — no eager driver action in the plan build.
    // coalesce to 0 so an empty target frame matches the oracle's
    // coalesce(sum(ct), 0) — real smoothed ratios, not null keys.
    val nt = tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))
      .withColumn("__k", lit(1))
    val nr = rawC.agg(sum(col("cr")).as("nr")).withColumn("__k", lit(1))
    rawC.withColumn("__k", lit(1))
      .join(tgt, Seq("b"), "left")
      .join(broadcast(nt), Seq("__k"))
      .join(broadcast(nr), Seq("__k"))
      .select(col("b"),
        round(
          log((coalesce(col("ct"), lit(0L)) + lit(1)) / (col("nt") + lit(buckets))) -
          log((col("cr") + lit(1)) / (col("nr") + lit(buckets))), 8)
          .cast("decimal(20,8)").as("r"))
  }

  /** Train [[ImportanceStats]] for stream-side scoring: buckets seen
    * in the raw pool carry their smoothed target/raw log-ratio.
    * (Grams hashing to a bucket the raw pool never produced carry no
    * trained ratio and score zero in the streaming twin.) */
  def importanceTrain(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int): ImportanceStats =
    ImportanceStats(
      bucketRatios(
        docBuckets(raw, idCol, textCol, buckets),
        docBuckets(target, idCol, textCol, buckets), buckets),
      buckets)

  /** One batch's aggregated (b, cr) bucket counts — the weekly
    * cadence's writable slice for importance statistics. Counts are
    * additive, so slices compose by union + re-sum: the same
    * append-structured state shape as the curation cadence's
    * index/signature slices (batch-scale writes only, nothing
    * corpus-scale ever rewritten). */
  def importanceCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docBuckets(df, idCol, textCol, buckets)
      .groupBy(col("b")).agg(sum(col("n")).as("cr"))

  /** Importance statistics from composed count slices: union the
    * per-batch [[importanceCounts]] frames along the state lineage
    * and pass them here with the (fixed) target corpus — spec-pinned
    * equal to [[importanceTrain]] over the concatenated raw batches. */
  def importanceTrainFromCounts(rawCountSlices: DataFrame,
      target: DataFrame, idCol: String, textCol: String,
      buckets: Int): ImportanceStats =
    ImportanceStats(
      ratiosFromCounts(
        rawCountSlices.groupBy(col("b")).agg(sum(col("cr")).as("cr")),
        docBuckets(target, idCol, textCol, buckets)
          .groupBy(col("b")).agg(sum(col("n")).as("ct")),
        buckets),
      buckets)

  def importanceResample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int, take: Int): DataFrame = {
    import graft.functions.TextFunctions.shingleHash32
    val rawB = docBuckets(raw, idCol, textCol, buckets).persist()
    val ratio = bucketRatios(rawB, docBuckets(target, idCol, textCol, buckets),
      buckets)
    val weights = rawB
      .join(broadcast(ratio), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("n").cast("decimal(10,0)") * col("r")).as("w_dec"))
    // Gumbel key: u in (0,1) from the md5-32 bucket (exactly
    // representable, never 0 or 1), g = -ln(-ln u) rounded to 8dp.
    // w_dec (the decimal(38,8) sum) is cast down to decimal(30,8)
    // first: adding at precision 38 would push the result past
    // Spark's 38-digit cap, and Spark resolves that by REDUCING THE
    // SCALE to 7 — a silent 1e-8 round that DuckDB (which keeps
    // scale under its cap) does not perform, flipping 6dp-boundary
    // keys. |w| is bounded by grams-per-doc x max|ratio| << 1e22, so
    // the downcast itself is exact.
    val u = (shingleHash32(concat(lit("dsir-"), col("doc_id").cast("string")))
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val keyed = weights.withColumn("k",
      col("w_dec").cast("decimal(30,8)") +
        round(-log(-log(u)), 8).cast("decimal(20,8)"))
    val top = keyed.orderBy(col("k").desc, col("doc_id")).limit(take)
    // Round the DECIMALs, THEN cast: decimal round is half-away-from-
    // zero in both engines, and a 6dp decimal converts to double
    // exactly (numerator < 2^53). Casting first would round twice —
    // DuckDB converts scaled-int128 / 1e8 in floating point — and a
    // scale-8 half-boundary then flips the 6dp round (observed: five
    // sel_key rows off by exactly 1e-6 at sf0.01).
    CacheLease.releaseAfterAction(
      // __bnd rename: rank window over the limit(take) survivors only —
      // bounded frame, declared for graft.WindowTripwire.
      top.withColumn("__bnd_k", col("k")).select(
        row_number().over(Window.orderBy(col("__bnd_k").desc, col("doc_id")))
          .cast("int").as("rank"),
        col("doc_id"),
        round(col("w_dec"), 6).cast("double").as("importance"),
        round(col("k"), 6).cast("double").as("sel_key"))
    )(() => rawB.unpersist())
  }

  /** RefinedWeb-style per-source cap (Penedo et al. 2023 §3.1 apply a
    * per-domain cap to stop any single site from dominating the
    * corpus): keep at most `cap` documents per `groupCol` value,
    * chosen by a deterministic md5-derived draw so the kept set is a
    * uniform sample of the group, reproducible on any engine.
    *
    * The selection runs through the bounded
    * [[graft.functions.expr.TopKByScore]] aggregate, NOT a
    * `row_number()` window: the window form shuffles and sorts every
    * row of a group just to discard all but `cap` — for a hot domain
    * holding 30% of a 100 TB crawl that is one executor sorting 30 TB.
    * As a partial aggregate each map task keeps <= cap rows per group,
    * so only cap * |groups| rows cross the exchange and the hot group
    * costs the same as any other.
    *
    * Ordering key: the first 13 hex chars of md5(id) as a numeric
    * draw — 52 bits, exactly representable in the aggregate's double
    * score (15+ hex chars would round and could reorder), ties (~2^-52)
    * broken by id ASC. Emits (doc_id, groupCol, rank). */
  def groupCap(docs: DataFrame, idCol: String, groupCol: String,
      cap: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // TopKByScore ranks score DESC; negate so the smallest md5 wins.
    val draw = -conv(substring(md5(col(idCol).cast("string")), 1, 13),
      16, 10).cast("long").cast("double")
    val agg = ColumnBridge.column(graft.functions.expr.TopKByScore(
      ColumnBridge.expression(draw),
      ColumnBridge.expression(col(idCol)), cap).toAggregateExpression())
    docs.groupBy(col(groupCol))
      .agg(agg.as("topk"))
      .select(col(groupCol), posexplode(col("topk")).as(Seq("pos", "e")))
      .select(col("e.id").as("doc_id"), col(groupCol),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Epoch-based source upsampling — the data-recipe form pretraining
    * mixes are published in (e.g. the LLaMA table: Wikipedia 2.45
    * epochs, CommonCrawl 1.10): each document of group g appears
    * floor(e_g) times, plus once more for the deterministic
    * frac(e_g)-fraction of its docs (md5 draw with a salt, so the
    * fractional subset is independent of the q48/q80 draws). e_g < 1
    * degenerates to plain subsampling. Output: (doc_id, group, epoch)
    * — the replicated corpus listing a shard writer consumes.
    *
    * `epochs` values are given in PERCENT (245 = 2.45 epochs) so
    * fractional-part arithmetic stays integer-exact on both engines. */
  def epochMix(docs: DataFrame, idCol: String, groupCol: String,
      epochsPct: Map[String, Int], defaultPct: Int): DataFrame = {
    require((epochsPct.values ++ Seq(defaultPct)).forall(_ >= 0))
    val pct = epochsPct.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
      case (acc, (g, p)) =>
        Some(acc.fold(when(col(groupCol) === g, p))(_.when(col(groupCol) === g, p)))
    }.fold(lit(defaultPct))(_.otherwise(defaultPct))
    epochReplicate(
      docs.select(col(idCol).as("doc_id"), col(groupCol), pct.as("pct")),
      groupCol)
  }

  /** [[epochMix]] driven by a PLAN FRAME `(group, pct)` instead of a
    * static map — the composition target for COMPUTED recipes (e.g.
    * the [[temperatureMixHalf]] table exported as epoch percents).
    * Same draw and replication arithmetic; groups absent from the
    * plan fall back to `defaultPct`. The plan is |groups| rows —
    * broadcast by AQE; the corpus side stays one map pass. */
  def epochMixByPlan(docs: DataFrame, idCol: String, groupCol: String,
      plan: DataFrame, defaultPct: Int): DataFrame =
    epochReplicate(
      docs.select(col(idCol).as("doc_id"), col(groupCol))
        .join(plan.select(col(groupCol), col("pct")), Seq(groupCol), "left")
        .select(col("doc_id"), col(groupCol),
          coalesce(col("pct"), lit(defaultPct)).as("pct")),
      groupCol)

  /** Shared replication tail: integer-percent epochs + the salted md5
    * fractional draw over a (doc_id, group, pct) frame. */
  private def epochReplicate(keyed: DataFrame, groupCol: String): DataFrame = {
    val draw = pmod(
      conv(substring(md5(concat(col("doc_id").cast("string"), lit("#epoch"))),
        1, 13), 16, 10).cast("long"), lit(100))
    keyed
      .withColumn("n_epochs",
        (col("pct") / 100).cast("int") +
          when(draw < pmod(col("pct"), lit(100)), 1).otherwise(0))
      .where(col("n_epochs") >= 1)
      .select(col("doc_id"), col(groupCol),
        explode(sequence(lit(1), col("n_epochs"))).as("epoch"))
      .withColumn("epoch", col("epoch").cast("int"))
  }

  /** Leakage-safe train/val/test split: the split key is the doc's
    * near-dup CLUSTER canonical (its own id when unclustered), so
    * near-duplicate documents can never straddle a split boundary —
    * the guarantee that keeps a held-out split honest when the corpus
    * contains near-dups (splitting by raw doc id silently leaks
    * paraphrases of training docs into eval).
    *
    * Assignment is the deterministic md5 draw (the [[groupCap]] 13-hex
    * discipline): bucket = md5(split_key) mod 100, split = the first
    * name whose cumulative weight exceeds the bucket. One broadcast-
    * able cluster join + map-tier hashing — no shuffle beyond the
    * join; scales with the cluster table, not the corpus.
    *
    * `splits` are (name, percent) with percents summing to 100. */
  def leakageSafeSplit(docs: DataFrame, clusters: DataFrame, idCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split weights must sum to 100: $splits")
    val key = coalesce(col("canonical_id"), col("doc_id"))
    val cums = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val splitExpr = splits.map(_._1).zip(cums).foldLeft(Option.empty[Column]) {
      case (acc, (name, hi)) =>
        Some(acc.fold(when(col("bucket") < hi, name))(
          _.when(col("bucket") < hi, name)))
    }.get
    docs.select(col(idCol).as("doc_id"))
      .join(clusters.select(col("doc_id"), col("canonical_id")), Seq("doc_id"), "left")
      .select(col("doc_id"), key.as("split_key"))
      .withColumn("bucket", pmod(
        conv(substring(md5(col("split_key").cast("string")), 1, 13), 16, 10)
          .cast("long"), lit(100)).cast("int"))
      .withColumn("split", splitExpr)
  }

  /** Temperature-scaled source mixing at alpha = 1/2 (the multilingual
    * /multi-source rebalance rule: sampling weight proportional to
    * size^alpha, so small sources are upweighted relative to their
    * share — the published mBERT/XLM-R exponent family). alpha = 1/2
    * exactly, because `sqrt` is a CORRECTLY-ROUNDED IEEE-754 operation
    * (unlike `pow`/`exp`/`ln`, which vary by libm — the q86
    * squaring-chain rule): every arithmetic step here is bit-identical
    * across engines, so the DuckDB oracle replays the mix table
    * without tolerance.
    *
    * Determinism discipline: per-group token totals are integer-exact;
    * weights are 6dp-rounded doubles cast to DECIMAL so the total
    * weight is an EXACT sum (order-invariant); shares divide the two
    * decimal-exact values as doubles (one correctly-rounded division);
    * target token counts floor a double product of exact inputs.
    *
    * Scale shape: one groupBy(group) over the corpus (map-side
    * combined), then all arithmetic happens on the |groups|-row frame
    * — the cross join against the 1-row total is trivially broadcast.
    * Output: (group, n_tokens, weight, share, target_tokens). */
  def temperatureMixHalf(docs: DataFrame, groupCol: String,
      nTokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val tot = docs.groupBy(col(groupCol))
      .agg(sum(col(nTokensCol)).as("n_tokens"))
      .withColumn("w",
        round(sqrt(col("n_tokens").cast("double")), 6).cast("decimal(24,6)"))
    val wTotal = tot.agg(sum(col("w")).as("w_total"))
    tot.crossJoin(wTotal)
      .select(col(groupCol), col("n_tokens"),
        col("w").cast("double").as("weight"),
        round(col("w").cast("double") / col("w_total").cast("double"), 6)
          .as("share"))
      .withColumn("target_tokens",
        floor(lit(budgetTokens.toDouble) * col("share")).cast("long"))
  }

  /** Balanced shard assignment: per-group round-robin over documents
    * in descending token order (the relational cousin of LPT greedy
    * bin balancing — the heaviest docs spread across shards first, so
    * per-shard token totals stay within one max-document of each
    * other per group). Ranks come from
    * [[graft.operators.Ranking.groupedRank]] — a window partitioned by
    * the group key (source, language, date bucket) would put the
    * dominant group's every row on one task at corpus scale; the
    * histogram + tie-group form keeps per-task work bounded by
    * |distinct token counts| and tie-run sizes.
    *
    * The rank weight is `coalesce(nTokensCol, 0)`: [[Ranking]]'s null
    * contract EXCLUDES null-order rows, and a document must never
    * silently lose its shard assignment because its token count is
    * null (ADVICE r08) — a weightless doc ranks last and still lands.
    *
    * Output: one row per document with its shard id — the frame a
    * distributed writer partitions by. */
  def balancedShards(docs: DataFrame, idCol: String, groupCol: String,
      nTokensCol: String, shards: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    val weighted = docs.withColumn("__w",
      coalesce(col(nTokensCol).cast("long"), lit(0L)))
    Ranking.groupedRank(weighted, Seq(groupCol), "__w", idCol, "__rn",
        descending = true)
      .withColumn("shard", pmod(col("__rn") - 1, lit(shards)).cast("int"))
      .drop("__rn", "__w")
  }

  /** Shard balance report over a [[balancedShards]] assignment: per-
    * shard doc/token totals plus each shard's fill ratio against the
    * heaviest shard — the skew number a write job publishes (a ratio
    * near 1.0 for every shard means no straggler executor at read
    * time). The over-all-shards max is a window over a |shards|-row
    * aggregate, not the corpus. */
  def shardBalance(assigned: DataFrame, nTokensCol: String): DataFrame = {
    val perShard = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(nTokensCol)).as("total_tokens"))
    // __bnd rename: the all-rows max runs over the |shards|-row
    // aggregate — bounded frame, declared for graft.WindowTripwire.
    perShard
      .withColumn("__bnd_tok", col("total_tokens"))
      .withColumn("fill_ratio",
        round(col("total_tokens").cast("double") /
          max(col("__bnd_tok")).over(Window.partitionBy()).cast("double"), 6))
      .drop("__bnd_tok")
  }

  /** Mix drift monitor: per-group token share of batch A vs batch B
    * and the share delta — the ops dashboard number that catches a
    * crawl source silently changing volume between ingest waves
    * (upstream outages, crawler policy changes, spam floods all show
    * up here first). One corpus pass: conditional sums per group,
    * 1-row batch totals cross-joined back; shares are single double
    * divisions of exact integer sums, so the table is engine-exact.
    * `flagThreshold` marks |drift| above the alerting bar. */
  def mixDrift(docs: DataFrame, groupCol: String, nTokensCol: String,
      batchCol: String, flagThreshold: Double): DataFrame = {
    val perGroup = docs.groupBy(col(groupCol))
      .agg(
        sum(when(col(batchCol) === 0, col(nTokensCol)).otherwise(0L))
          .as("tokens_a"),
        sum(when(col(batchCol) =!= 0, col(nTokensCol)).otherwise(0L))
          .as("tokens_b"))
    val totals = perGroup.agg(
      sum(col("tokens_a")).as("total_a"),
      sum(col("tokens_b")).as("total_b"))
    perGroup.crossJoin(totals)
      .select(col(groupCol), col("tokens_a"), col("tokens_b"),
        round(col("tokens_a").cast("double") / col("total_a").cast("double"), 6)
          .as("share_a"),
        round(col("tokens_b").cast("double") / col("total_b").cast("double"), 6)
          .as("share_b"))
      .withColumn("share_drift", round(col("share_b") - col("share_a"), 6))
      .withColumn("drift_flag", abs(col("share_drift")) > flagThreshold)
  }

  /** Packing efficiency report over a [[packSequences]] packing: per
    * shard, how full the fixed-budget bins actually are — the padding
    * -waste number that decides whether a packing recipe ships (every
    * bin is padded to `budget` tokens at training time, so
    * 1 - fill_ratio IS the wasted compute fraction). Aggregates the
    * (shard, bin) frame — already tiny — into |shards| rows. */
  def packingEfficiency(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"))
      .withColumn("capacity_tokens", col("n_bins") * budget)
      .withColumn("fill_ratio",
        round(col("total_tokens").cast("double") /
          col("capacity_tokens").cast("double"), 6))
}
