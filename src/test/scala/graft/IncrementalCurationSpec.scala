package graft

import org.apache.spark.sql.functions.{coalesce, col, lit, round, sum, when}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{CurationRun, StateLayout}

/** Weekly-cadence curation (VERDICT r04 item 8): init(A) then
  * incremental(B) must land the SAME curated corpus, packed bins, and
  * cluster state as a from-scratch run over A ∪ B — including a new
  * batch doc that near-duplicates an old doc (cross-batch cluster
  * merge) and a new-new duplicate pair. */
class IncrementalCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodEn =
    "the quick brown fox jumps over the lazy dog while the calm river " +
      "flows past the old stone bridge near the quiet village green today"
  private val goodEs =
    "el zorro marron salta sobre el perro perezoso mientras la luna " +
      "brilla sobre el valle y la gente duerme en la aldea tranquila"
  private val benchText =
    "pack my box with five dozen liquor jugs before the long winter " +
      "arrives and the mountain roads close under the heavy snow again"
  private val freshA =
    "seven silver swans swim slowly southward seeking summer sunshine " +
      "over green meadows where tall grass bends beneath the warm wind"

  test("incremental batch equals from-scratch over both batches") {
    val batchA = Seq(
      (1L, goodEn),
      (2L, goodEn.replace("today", "tonight")), // near-dup of 1 (within A)
      (3L, goodEs),
      (4L, benchText),                          // decontaminated away
      (5L, freshA)).toDF("doc_id", "text")
    val batchB = Seq(
      (11L, goodEn.replace("today", "right now")), // near-dup of 1 (cross-batch)
      (12L, freshA.replace("warm", "cold")),       // near-dup of 5 (cross-batch)
      (13L, "entirely novel content about distant mountains and deep " +
        "valleys that resembles nothing in the first weekly batch at all"),
      (14L, benchText.replace("again", "soon"))    // decontaminated away
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")

    val base = TestSpark.tmpDir("inc_curation")
    val scratch = CurationRun.runInit(
      batchA.unionByName(batchB), benchmark, s"$base/out_scratch", s"$base/state_scratch")
    CurationRun.runInit(batchA, benchmark, s"$base/out_a", s"$base/state_1")
    val incr = CurationRun.runIncremental(
      batchB, benchmark, s"$base/out_incr", s"$base/state_1", s"$base/state_2")

    def curated(dir: String): Set[(Long, String, String)] =
      spark.read.parquet(s"$dir/curated")
        .select("doc_id", "text", "detected_lang")
        .as[(Long, String, String)].collect().toSet
    def packed(dir: String): Set[String] =
      spark.read.parquet(s"$dir/packed")
        .select("doc_ids").as[String].collect().toSet
    def clusters(stateDir: String): Set[(Long, Long)] =
      spark.read.parquet(s"$stateDir/clusters")
        .as[(Long, Long)].collect().toSet

    assert(curated(s"$base/out_incr") == curated(s"$base/out_scratch"),
      "curated corpus diverged from the from-scratch run")
    assert(packed(s"$base/out_incr") == packed(s"$base/out_scratch"),
      "packed bins diverged from the from-scratch run")
    assert(clusters(s"$base/state_2") == clusters(s"$base/state_scratch"),
      "cluster state diverged from the from-scratch run")
    assert(incr.kept == scratch.kept && incr.sampled == scratch.sampled)
    // The cross-batch merges actually happened: 11 joined 1's cluster,
    // 12 joined 5's.
    val c = clusters(s"$base/state_2").toMap
    assert(c(11L) == c(1L) && c(12L) == c(5L))
    // And the state stays usable: a THIRD batch over the updated state.
    val batchC = Seq((21L, goodEs.replace("luna", "estrella")))
      .toDF("doc_id", "text") // near-dup of 3
    CurationRun.runIncremental(
      batchC, benchmark, s"$base/out_c", s"$base/state_2", s"$base/state_3")
    val scratchAll = CurationRun.runInit(
      batchA.unionByName(batchB).unionByName(batchC), benchmark,
      s"$base/out_scratch3", s"$base/state_scratch3")
    assert(curated(s"$base/out_c") == curated(s"$base/out_scratch3"))
    assert(clusters(s"$base/state_3") == clusters(s"$base/state_scratch3"))
  }

  test("semantic stage rides the incremental cadence: init+inc == scratch, cross-batch semantic dup dropped") {
    // Doc 5 (batch A) and doc 13 (batch B) are paraphrases: different
    // text (no shingle overlap), IDENTICAL embeddings — only the
    // semantic stage can catch the pair, and only once both batches
    // are in the corpus. The stage runs after survivor selection on
    // the composed kept frame in both cadences, so the equality pin
    // extends through it.
    val batchA = Seq(
      (1L, goodEn),
      (3L, goodEs),
      (5L, freshA)).toDF("doc_id", "text")
    val batchB = Seq(
      (11L, goodEn.replace("today", "right now")), // near-dup of 1
      (13L, "entirely novel content about distant mountains and deep " +
        "valleys that resembles nothing in the first weekly batch at all")
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0f)),
      (5L, Seq(0f, 1f, 0f, 0f)),
      (11L, Seq(0.9f, 0.1f, 0f, 0f)),
      (13L, Seq(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val semEmb = Some(emb)

    val base = TestSpark.tmpDir("inc_curation_sem")
    val scratch = CurationRun.runInit(
      batchA.unionByName(batchB), benchmark,
      s"$base/out_scratch", s"$base/state_scratch",
      embeddings = semEmb, semClusters = 2)
    val initA = CurationRun.runInit(batchA, benchmark,
      s"$base/out_a", s"$base/state_1",
      embeddings = semEmb, semClusters = 2)
    val incr = CurationRun.runIncremental(batchB, benchmark,
      s"$base/out_incr", s"$base/state_1", s"$base/state_2",
      embeddings = semEmb, semClusters = 2)

    def curated(dir: String): Set[Long] =
      spark.read.parquet(s"$dir/curated")
        .select("doc_id").as[Long].collect().toSet
    assert(curated(s"$base/out_incr") == curated(s"$base/out_scratch"),
      "curated corpus diverged from the from-scratch run")
    assert(incr.semDropped == scratch.semDropped && incr.semDropped == 1,
      "the cross-batch semantic dup must drop in both cadences")
    assert(initA.semDropped == 0,
      "batch A alone has no semantic dup — the pair only exists composed")
    assert(curated(s"$base/out_incr") == Set(1L, 3L, 5L),
      "near-dup 11 collapses into 1; semantic dup 13 drops against 5")
  }

  test("semantic STATE cadence: frozen quantizer, init+inc+inc == seeded scratch (VERDICT r06 item 3)") {
    // The incremental machinery (per-batch cell assignment + new-vs-
    // composed within-cell pairs + contracted label merge) must equal
    // the full within-cell pass over the composed corpus UNDER THE
    // SAME frozen centroids — the embedding-space twin of the LSH
    // cadence's equality pin, across TWO incremental batches.
    val batchA = Seq((1L, goodEn), (3L, goodEs), (5L, freshA))
      .toDF("doc_id", "text")
    val batchB = Seq(
      (13L, "entirely novel content about distant mountains and deep " +
        "valleys that resembles nothing in the first weekly batch at all")
    ).toDF("doc_id", "text")
    val batchC = Seq(
      (21L, "completely different prose describing winding rivers and " +
        "ancient forests that shares no phrasing with earlier batches here")
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")
    // 13 paraphrases 5 (identical embedding); 21 paraphrases 13 —
    // cross-batch semantic chains 5-13-21 must collapse to doc 5.
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0f)),
      (5L, Seq(0f, 1f, 0f, 0f)),
      (13L, Seq(0f, 1f, 0f, 0f)),
      (21L, Seq(0f, 0.999f, 0.04f, 0f))).toDF("vec_id", "embedding")
    val semEmb = Some(emb)

    val base = TestSpark.tmpDir("inc_curation_semstate")
    CurationRun.runInit(batchA, benchmark, s"$base/out_a", s"$base/state_1",
      embeddings = semEmb, semClusters = 2, semanticState = true)
    val inc1 = CurationRun.runIncremental(batchB, benchmark,
      s"$base/out_b", s"$base/state_1", s"$base/state_2",
      embeddings = semEmb, semClusters = 2)
    val inc2 = CurationRun.runIncremental(batchC, benchmark,
      s"$base/out_c", s"$base/state_2", s"$base/state_3",
      embeddings = semEmb, semClusters = 2)
    // Seeded scratch: same machinery, non-incrementally, under the
    // SAME frozen centroids the lineage carries.
    val scratch = CurationRun.runInit(
      batchA.unionByName(batchB).unionByName(batchC), benchmark,
      s"$base/out_scratch", s"$base/state_scratch",
      embeddings = semEmb, semClusters = 2, semanticState = true,
      semCentroidsIn = Some(s"$base/state_1/sem_centroids"))

    def curated(dir: String): Set[Long] =
      spark.read.parquet(s"$dir/curated")
        .select("doc_id").as[Long].collect().toSet
    def semClusters(stateDir: String): Set[(Long, Long)] =
      spark.read.parquet(s"$stateDir/sem_clusters")
        .as[(Long, Long)].collect().toSet

    assert(semClusters(s"$base/state_3") == semClusters(s"$base/state_scratch"),
      "incremental semantic labels diverged from the seeded scratch run")
    assert(curated(s"$base/out_c") == curated(s"$base/out_scratch"),
      "curated corpus diverged from the seeded scratch run")
    assert(curated(s"$base/out_c") == Set(1L, 3L, 5L),
      "the 5-13-21 semantic chain must collapse to its lowest kept doc")
    assert(inc1.semDropped == 1 && inc2.semDropped == 2,
      "each weekly run reports the composed-corpus semantic drops")
    // The state stays self-contained: centroids were carried forward.
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/state_3/sem_centroids")))
    // Per-batch cell slices are batch-scale: each incremental wrote
    // exactly its own docs' assignments.
    def cellRows(stateDir: String): Set[Long] =
      spark.read.parquet(s"$stateDir/sem_cells_batch")
        .select("vec_id").as[Long].collect().toSet
    assert(cellRows(s"$base/state_2") == Set(13L),
      "a weekly batch assigns cells for its own docs only")
    assert(cellRows(s"$base/state_3") == Set(21L))
  }

  test("rebase with retrainSemantic == fresh init over the composed corpus") {
    // The frozen-quantizer contract's drift valve: a retraining rebase
    // must land EXACTLY the semantic state a from-scratch init over
    // the composed corpus would (same deterministic k-means, same
    // cells, same labels), so post-rebase incrementals compose
    // exactly against it.
    val batchA = Seq((1L, goodEn), (3L, goodEs), (5L, freshA))
      .toDF("doc_id", "text")
    val batchB = Seq(
      (13L, "entirely novel content about distant mountains and deep " +
        "valleys that resembles nothing in the first weekly batch at all")
    ).toDF("doc_id", "text")
    val batchC = Seq(
      (21L, "completely different prose describing winding rivers and " +
        "ancient forests that shares no phrasing with earlier batches here")
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0f)),
      (5L, Seq(0f, 1f, 0f, 0f)),
      (13L, Seq(0f, 1f, 0f, 0f)),
      (21L, Seq(0f, 0.999f, 0.04f, 0f))).toDF("vec_id", "embedding")
    val semEmb = Some(emb)

    val base = TestSpark.tmpDir("inc_curation_rebase_sem")
    CurationRun.runInit(batchA, benchmark, s"$base/out_a", s"$base/state_1",
      embeddings = semEmb, semClusters = 2, semanticState = true)
    CurationRun.runIncremental(batchB, benchmark,
      s"$base/out_b", s"$base/state_1", s"$base/state_2",
      embeddings = semEmb, semClusters = 2)
    // Retraining rebase over the composed A+B state.
    CurationRun.rebaseState(spark, s"$base/state_2", s"$base/state_r",
      retrainSemantic = true, embeddings = semEmb, semClusters = 2,
      semThreshold = 0.99)
    // Fresh init over the composed corpus — the equality target.
    CurationRun.runInit(batchA.unionByName(batchB), benchmark,
      s"$base/out_f", s"$base/state_f",
      embeddings = semEmb, semClusters = 2, semanticState = true)

    def centroids(d: String): Set[(Int, Seq[Double])] =
      spark.read.parquet(s"$d/sem_centroids")
        .as[(Int, Seq[Double])].collect().toSet
    def semClustersOf(d: String): Set[(Long, Long)] =
      spark.read.parquet(s"$d/sem_clusters")
        .as[(Long, Long)].collect().toSet
    def cells(d: String): Set[(Long, Long)] =
      graft.pipeline.StateLayout.readSlice(spark, s"$d/sem_cells_batch")
        .as[(Long, Long)].collect().toSet
    assert(centroids(s"$base/state_r") == centroids(s"$base/state_f"),
      "retrained quantizer must equal the fresh-init quantizer")
    assert(cells(s"$base/state_r") == cells(s"$base/state_f"),
      "reassigned cells must equal the fresh-init cells")
    assert(semClustersOf(s"$base/state_r") == semClustersOf(s"$base/state_f"),
      "recomputed labels must equal the fresh-init labels")

    // And the rebased state serves incrementals exactly: inc(C) from
    // state_r == seeded scratch over A+B+C under state_r's quantizer.
    val incr = CurationRun.runIncremental(batchC, benchmark,
      s"$base/out_c", s"$base/state_r", s"$base/state_3",
      embeddings = semEmb, semClusters = 2)
    val scratch = CurationRun.runInit(
      batchA.unionByName(batchB).unionByName(batchC), benchmark,
      s"$base/out_s", s"$base/state_s",
      embeddings = semEmb, semClusters = 2, semanticState = true,
      semCentroidsIn = Some(s"$base/state_r/sem_centroids"))
    def curated(dir: String): Set[Long] =
      spark.read.parquet(s"$dir/curated")
        .select("doc_id").as[Long].collect().toSet
    assert(curated(s"$base/out_c") == curated(s"$base/out_s"),
      "post-retrain incremental diverged from the seeded scratch run")
    assert(semClustersOf(s"$base/state_3") == semClustersOf(s"$base/state_s"))
    assert(incr.semDropped == scratch.semDropped)
  }

  test("lineage compaction: post-rebase incremental equals pre-rebase incremental") {
    // init(A) + inc(B) builds a 2-entry lineage; rebase collapses it to
    // one consolidated dir. A third batch incremented over BOTH states
    // must land identical outputs and cluster state — including a
    // cross-batch merge whose partner doc entered in batch A (so the
    // rebased slices, not just the label table, must carry it).
    val batchA = Seq(
      (1L, goodEn),
      (3L, goodEs),
      (5L, freshA)).toDF("doc_id", "text")
    val batchB = Seq(
      (11L, goodEn.replace("today", "right now")), // near-dup of 1
      (13L, "entirely novel content about distant mountains and deep " +
        "valleys that resembles nothing in the first weekly batch at all")
    ).toDF("doc_id", "text")
    val batchC = Seq(
      (21L, goodEs.replace("luna", "estrella")),   // near-dup of 3 (batch A!)
      (22L, "completely fresh third week material describing bright " +
        "harbors and tall ships sailing toward the northern islands now")
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")

    val base = TestSpark.tmpDir("inc_curation_rebase")
    CurationRun.runInit(batchA, benchmark, s"$base/out_a", s"$base/state_1")
    CurationRun.runIncremental(
      batchB, benchmark, s"$base/out_b", s"$base/state_1", s"$base/state_2")

    CurationRun.rebaseState(spark, s"$base/state_2", s"$base/state_r")
    val lineage = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(s"$base/state_r/lineage.txt"))
    assert(lineage.size == 1 && lineage.get(0) == s"$base/state_r",
      "rebase must truncate the lineage to the consolidated dir itself")

    val viaOld = CurationRun.runIncremental(
      batchC, benchmark, s"$base/out_c_old", s"$base/state_2", s"$base/state_3o")
    val viaRebased = CurationRun.runIncremental(
      batchC, benchmark, s"$base/out_c_reb", s"$base/state_r", s"$base/state_3r")

    def curated(dir: String): Set[(Long, String)] =
      spark.read.parquet(s"$dir/curated")
        .select("doc_id", "text").as[(Long, String)].collect().toSet
    def clusters(stateDir: String): Set[(Long, Long)] =
      spark.read.parquet(s"$stateDir/clusters")
        .as[(Long, Long)].collect().toSet
    assert(curated(s"$base/out_c_reb") == curated(s"$base/out_c_old"),
      "curated output diverged across the rebase")
    assert(clusters(s"$base/state_3r") == clusters(s"$base/state_3o"),
      "cluster state diverged across the rebase")
    assert(viaRebased.kept == viaOld.kept &&
      viaRebased.sampled == viaOld.sampled &&
      viaRebased.decontaminated == viaOld.decontaminated)
    // The cross-batch merge through the rebased slices happened: 21
    // joined 3's cluster even though 3's index slice was consolidated.
    val c = clusters(s"$base/state_3r").toMap
    assert(c(21L) == c(3L),
      "post-rebase incremental must still merge against pre-rebase docs")
  }

  test("ANN-codes state cadence: frozen model, batch-scale append, composed == scratch (VERDICT r07 item 3)") {
    import graft.operators.VectorSim
    val batchA = Seq((1L, goodEn), (3L, goodEs), (5L, freshA))
      .toDF("doc_id", "text")
    val batchB = Seq(
      (13L, "entirely novel content about distant mountains and deep " +
        "valleys that resembles nothing in the first weekly batch at all")
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0f)),
      (5L, Seq(0f, 1f, 0f, 0f)),
      (13L, Seq(0.2f, 0.9f, 0.1f, 0.3f))).toDF("vec_id", "embedding")

    val base = TestSpark.tmpDir("inc_curation_ann")
    CurationRun.runInit(batchA, benchmark, s"$base/out_a", s"$base/state_1",
      embeddings = Some(emb), annState = true,
      annSubspaces = 2, annCodewords = 2, annClusters = 2)
    CurationRun.runIncremental(batchB, benchmark,
      s"$base/out_b", s"$base/state_1", s"$base/state_2",
      embeddings = Some(emb))

    def rows(path: String): Set[Seq[Any]] =
      graft.pipeline.StateLayout.readSlicePaths(spark, Seq(path))
        .collect().map(_.toSeq).toSet

    // The frozen model carries forward unchanged.
    assert(rows(s"$base/state_2/ann_model") == rows(s"$base/state_1/ann_model"),
      "the ANN model must be frozen through the increment")
    // Batch-scale write: the increment's slice codes ONLY batch B.
    val sliceIds = spark.read.parquet(s"$base/state_2/ann_codes_batch")
      .select("vec_id").as[Long].collect().toSet
    assert(sliceIds == Set(13L),
      s"weekly slice must encode only the batch, got $sliceIds")
    // init + inc slices compose to exactly a scratch encode of the
    // composed decon corpus under the read-back frozen model.
    val (m, cen) = VectorSim.annModelFromFrame(
      spark.read.parquet(s"$base/state_2/ann_model"))
    val deconIds = StateLayout.readSlicePaths(spark,
        Seq(s"$base/state_1/decon_batch", s"$base/state_2/decon_batch"))
      .select(col("doc_id"))
    val vecsAll = deconIds
      .join(emb, col("doc_id") === col("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val scratchCodes = VectorSim.annCodesFrame(vecsAll, m, cen)
    val composed = rows(s"$base/state_1/ann_codes_batch") ++
      rows(s"$base/state_2/ann_codes_batch")
    assert(composed == scratchCodes.collect().map(_.toSeq).toSet,
      "composed code slices must equal the from-scratch encode")
    // Serving from the composed artifact == serving from scratch codes.
    val queries = emb.where(col("vec_id") <= 3)
    val served = CurationRun.annServe(spark, s"$base/state_2",
        queries, nprobe = 2, k = 2)
      .collect().map(_.toSeq).toSet
    val scratchServed = VectorSim.pqSearchIvfFromCodes(queries,
        scratchCodes, m, cen, nprobe = 2, k = 2)
      .collect().map(_.toSeq).toSet
    assert(served == scratchServed,
      "annServe over the lineage must equal search over scratch codes")
    // Rebase consolidates the code slices as pure IO.
    CurationRun.rebaseState(spark, s"$base/state_2", s"$base/state_r")
    assert(rows(s"$base/state_r/ann_codes_batch") == composed,
      "rebase must consolidate the code slices unchanged")
    assert(rows(s"$base/state_r/ann_model") == rows(s"$base/state_1/ann_model"))
  }

  test("drift-gated rebase: planted drift retrains, stable corpus compacts (VERDICT r07 item 4)") {
    def cenRows(d: String): Set[(Int, Seq[Double])] =
      spark.read.parquet(s"$d/sem_centroids")
        .as[(Int, Seq[Double])].collect().toSet
    def semClustersOf(d: String): Set[(Long, Long)] =
      spark.read.parquet(s"$d/sem_clusters")
        .as[(Long, Long)].collect().toSet
    def cells(d: String): Set[(Long, Long)] =
      graft.pipeline.StateLayout.readSlice(spark, s"$d/sem_cells_batch")
        .as[(Long, Long)].collect().toSet
    // Init corpus: four docs whose embeddings form two TIGHT pairs, so
    // k=2 converges to the pair split and every state vector sits the
    // same distance from its centroid — state mean fit is a nonzero
    // symmetric m.
    val batchA = Seq((1L, goodEn), (3L, goodEs), (5L, freshA),
      (7L, "bright morning light falls gently across the wide open field " +
        "where farmers gather ripe golden wheat under the clear autumn sky"))
      .toDF("doc_id", "text")
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")
    val batchB = Seq(
      (13L, "entirely novel content about distant mountains and deep " +
        "valleys that resembles nothing in the first weekly batch at all")
    ).toDF("doc_id", "text")

    // STABLE: batch 13's embedding is an exact COPY of doc 1's, so its
    // fit equals doc 1's fit = the symmetric state mean — ratio 1.0,
    // strictly under the 1.5 threshold. Policy must take the
    // compaction branch and land the manual pure-IO rebase.
    val embStable = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (3L, Seq(0.8f, 0.2f, 0f, 0f)),
      (5L, Seq(0f, 0f, 1f, 0f)),
      (7L, Seq(0f, 0f, 0.8f, 0.2f)),
      (13L, Seq(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val b1 = TestSpark.tmpDir("drift_stable")
    CurationRun.runInit(batchA, benchmark, s"$b1/out_a", s"$b1/state_1",
      embeddings = Some(embStable), semClusters = 2, semanticState = true)
    CurationRun.runIncremental(batchB, benchmark,
      s"$b1/out_b", s"$b1/state_1", s"$b1/state_2",
      embeddings = Some(embStable), semClusters = 2)
    val retrained1 = CurationRun.rebaseIfDrifted(spark,
      s"$b1/state_2", s"$b1/state_p", embStable,
      driftRatio = 1.5, semClusters = 2)
    CurationRun.rebaseState(spark, s"$b1/state_2", s"$b1/state_m")
    assert(!retrained1, "a batch matching the state's fit must compact")
    assert(cenRows(s"$b1/state_p") == cenRows(s"$b1/state_2") &&
      cenRows(s"$b1/state_p") == cenRows(s"$b1/state_m"),
      "compaction branch must carry the frozen quantizer forward")
    assert(semClustersOf(s"$b1/state_p") == semClustersOf(s"$b1/state_m"))

    // DRIFTED: batch 13 lands far outside the trained distribution.
    // Policy must take the retrain branch and land exactly the manual
    // retrainSemantic rebase (== fresh init over the composed corpus,
    // already pinned above).
    val embDrift = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (3L, Seq(0.8f, 0.2f, 0f, 0f)),
      (5L, Seq(0f, 0f, 1f, 0f)),
      (7L, Seq(0f, 0f, 0.8f, 0.2f)),
      (13L, Seq(50f, 50f, 50f, 50f))).toDF("vec_id", "embedding")
    val b2 = TestSpark.tmpDir("drift_planted")
    CurationRun.runInit(batchA, benchmark, s"$b2/out_a", s"$b2/state_1",
      embeddings = Some(embDrift), semClusters = 2, semanticState = true)
    CurationRun.runIncremental(batchB, benchmark,
      s"$b2/out_b", s"$b2/state_1", s"$b2/state_2",
      embeddings = Some(embDrift), semClusters = 2)
    val retrained2 = CurationRun.rebaseIfDrifted(spark,
      s"$b2/state_2", s"$b2/state_p", embDrift,
      driftRatio = 1.5, semClusters = 2)
    CurationRun.rebaseState(spark, s"$b2/state_2", s"$b2/state_m",
      retrainSemantic = true, embeddings = Some(embDrift), semClusters = 2)
    assert(retrained2, "planted drift must take the retrain branch")
    assert(cenRows(s"$b2/state_p") == cenRows(s"$b2/state_m"),
      "policy retrain must equal the manual retrainSemantic rebase")
    assert(cells(s"$b2/state_p") == cells(s"$b2/state_m"))
    assert(semClustersOf(s"$b2/state_p") == semClustersOf(s"$b2/state_m"))
    assert(cenRows(s"$b2/state_p") != cenRows(s"$b2/state_2"),
      "the retrained quantizer must actually differ from the frozen one")

    // VERDICT r08 item 3: the decision now aggregates ingest-time
    // sem_fit_batch summaries instead of re-scanning state embeddings.
    // Pin (a) summary means == a full quantizerDrift re-score of the
    // same slices, bit-for-bit; (b) the O(#slices) decision picks the
    // same branch on both corpora; (c) a pure-IO rebase consolidates
    // the summaries losslessly.
    def cenOf(d: String): Seq[Array[Double]] =
      spark.read.parquet(s"$d/sem_centroids").as[(Int, Seq[Double])]
        .collect().sortBy(_._1).map(_._2.toArray).toSeq
    def vecsOf(stateDirs: Seq[String], emb: org.apache.spark.sql.DataFrame) =
      StateLayout.readSlicePaths(spark, stateDirs.map(d => s"$d/decon_batch"))
        .select(col("doc_id"))
        .join(emb.select(col("vec_id"), col("embedding")),
          col("doc_id") === col("vec_id"))
        .select(col("vec_id"), col("embedding"))
    def summaryFit(dirs: Seq[String]): (Long, Double) = {
      val r = spark.read.parquet(dirs.map(d => s"$d/sem_fit_batch"): _*)
        .agg(coalesce(sum(col("n_vectors")), lit(0L)).as("n"),
          sum(col("sum_dist")).as("s"))
        .select(col("n"), when(col("n") > 0,
          round(col("s").cast("double") / col("n"), 6))
          .otherwise(lit(0.0)).as("m"))
        .head()
      (r.getLong(0), r.getDouble(1))
    }
    for ((base, emb, wantRetrain) <- Seq(
        (b1, embStable, false), (b2, embDrift, true))) {
      val cen = cenOf(s"$base/state_2")
      val full = graft.operators.VectorSim.quantizerDrift(Seq(
          "state" -> vecsOf(Seq(s"$base/state_1"), emb),
          "batch" -> vecsOf(Seq(s"$base/state_2"), emb)), cen)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(summaryFit(Seq(s"$base/state_1")) == full("state"),
        s"$base: state summary must equal the full re-score")
      assert(summaryFit(Seq(s"$base/state_2")) == full("batch"),
        s"$base: batch summary must equal the full re-score")
      assert(CurationRun.quantizerDriftDecision(spark, s"$base/state_2")
        == wantRetrain, s"$base: O(#slices) decision must pick the same branch")
    }
    assert(summaryFit(Seq(s"$b1/state_m")) ==
      summaryFit(Seq(s"$b1/state_1", s"$b1/state_2")),
      "pure-IO rebase must consolidate fit summaries losslessly")

    // Pre-summary slices (a lineage whose older slices were written
    // before the ingest-time fit summary existed): the decision and
    // the consolidation must DEGRADE to re-scoring exactly those
    // slices from the caller's embeddings — same branch, same
    // consolidated summary — and without embeddings the missing
    // summary is a hard error naming the path, never a silent wrong
    // decision.
    val preConsolidated = summaryFit(Seq(s"$b1/state_m"))
    def rmTree(p: String): Unit = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(p)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rmTree(s"$b1/state_1/sem_fit_batch")
    val err = intercept[IllegalStateException] {
      CurationRun.quantizerDriftDecision(spark, s"$b1/state_2")
    }
    assert(err.getMessage.contains("sem_fit_batch"))
    assert(!CurationRun.quantizerDriftDecision(spark, s"$b1/state_2",
        embeddings = Some(embStable)),
      "re-scored pre-summary slice must reach the same (stable) branch")
    assert(!CurationRun.rebaseIfDrifted(spark, s"$b1/state_2",
        s"$b1/state_m2", embStable, driftRatio = 1.5, semClusters = 2),
      "policy over a degraded lineage must still compact")
    assert(summaryFit(Seq(s"$b1/state_m2")) == preConsolidated,
      "consolidation over a degraded lineage must rebuild the same summary")
  }

  test("span-df state cadence: batch cleaned against composed df, history frozen (append-only)") {
    import graft.operators.TextDedup
    // Shared 8+-token boilerplate: df 1 within history alone, df 2
    // once the batch arrives — only the COMPOSED counts can cut it.
    val boiler = "this standard license header appears at the top of every single file"
    val hist = Seq(
      (2L, s"$boiler alpha beta gamma unique history content about rivers and old bridges"),
      (4L, goodEn)).toDF("doc_id", "text")
    val batch = Seq(
      (11L, s"$boiler delta epsilon fresh words about mountains and distant green valleys")
    ).toDF("doc_id", "text")

    // Operator-level pin: incremental cleaning == from-scratch cleaning
    // over history ∪ batch, restricted to the batch docs.
    val counts = TextDedup.spanGramCounts(hist, "doc_id", "text", k = 8)
    val (cleaned, slice, rel) = TextDedup.removeRepeatedSpansIncremental(
      batch, "doc_id", "text", k = 8, minDf = 2, historyCounts = counts)
    val got = cleaned.as[(Long, String, Long)].collect().toSet
    val scratch = TextDedup.removeRepeatedSpans(
        hist.unionByName(batch), "doc_id", "text", k = 8, minDf = 2)
      .where(col("doc_id") === 11L)
      .as[(Long, String, Long)].collect().toSet
    rel()
    assert(got == scratch, "incremental must equal scratch on the batch docs")
    assert(got.head._3 > 0, "the cross-half boilerplate must actually be cut")
    // Composed slices == scratch counts over the composed corpus.
    val composed = counts.unionByName(slice)
      .groupBy(col("h")).agg(sum(col("n_docs")).as("n_docs"))
      .as[(Long, Long)].collect().toSet
    val scratchCounts = TextDedup.spanGramCounts(
        hist.unionByName(batch), "doc_id", "text", k = 8)
      .as[(Long, Long)].collect().toSet
    assert(composed == scratchCounts, "slice counts must add to the composed df")

    // Cadence-level: init lands A uncut (df 1), the increment cuts the
    // batch doc against the composed df, landed history text frozen.
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")
    val base = TestSpark.tmpDir("span_state")
    val init = CurationRun.runInit(hist, benchmark, s"$base/out_a",
      s"$base/state_1", spanState = true)
    assert(init.spanCleaned == 0L, "boilerplate is unique within the init corpus")
    def stored(d: String): Map[Long, String] =
      StateLayout.readSlice(spark, s"$d/decon_batch")
        .select("doc_id", "text").as[(Long, String)].collect().toMap
    val storedA = stored(s"$base/state_1")
    assert(storedA(2L).contains("standard license header"),
      "init must land the doc uncut at df 1")
    val inc = CurationRun.runIncremental(batch, benchmark, s"$base/out_b",
      s"$base/state_1", s"$base/state_2")
    assert(inc.spanCleaned == 1L, "the batch doc must lose the cross-batch span")
    val storedB = stored(s"$base/state_2")
    assert(!storedB(11L).contains("standard license header"),
      "the composed df must cut the boilerplate from the landed batch text")
    assert(stored(s"$base/state_1") == storedA,
      "landed history text is append-only — never rewritten")
    // Rebase consolidates the counts into one summed slice.
    CurationRun.rebaseState(spark, s"$base/state_2", s"$base/state_r")
    val consolidated = graft.pipeline.StateLayout
      .readSlicePaths(spark, Seq(s"$base/state_r/span_grams_batch"))
      .as[(Long, Long)].collect().toSet
    val viaSlices = graft.pipeline.StateLayout.readSlicePaths(spark,
        Seq(s"$base/state_1/span_grams_batch", s"$base/state_2/span_grams_batch"))
      .groupBy(col("h")).agg(sum(col("n_docs")).as("n_docs"))
      .as[(Long, Long)].collect().toSet
    assert(consolidated == viaSlices)
  }

  test("line-df state cadence: batch cleaned against composed df, history frozen") {
    import graft.operators.TextDedup
    // Shared footer LINE: df 1 within history alone, df 2 once the
    // batch arrives — only the COMPOSED line counts can cut it.
    val footer = "subscribe to the weekly newsletter for more updates and stories"
    val hist = Seq(
      (2L, s"unique history content about rivers and old bridges today\n$footer"),
      (4L, goodEn)).toDF("doc_id", "text")
    val batch = Seq(
      (11L, s"fresh words about mountains and distant green valleys\n$footer"))
      .toDF("doc_id", "text")
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")
    val base = TestSpark.tmpDir("line_state")
    val init = CurationRun.runInit(hist, benchmark, s"$base/out_a",
      s"$base/state_1", lineState = true)
    assert(init.lineCleaned == 0L, "the footer is unique within the init corpus")
    def stored(d: String): Map[Long, String] =
      StateLayout.readSlice(spark, s"$d/decon_batch")
        .select("doc_id", "text").as[(Long, String)].collect().toMap
    val storedA = stored(s"$base/state_1")
    assert(storedA(2L).contains(footer), "init must land the doc uncut at df 1")
    val inc = CurationRun.runIncremental(batch, benchmark, s"$base/out_b",
      s"$base/state_1", s"$base/state_2")
    assert(inc.lineCleaned == 1L, "the batch doc must lose the cross-batch footer")
    val storedB = stored(s"$base/state_2")
    assert(!storedB(11L).contains(footer),
      "the composed df must cut the footer from the landed batch text")
    assert(storedB(11L).contains("fresh words about mountains"),
      "only the footer line goes; the original line stays")
    assert(stored(s"$base/state_1") == storedA,
      "landed history text is append-only — never rewritten")
    // The landed batch text equals the operator-level scratch form over
    // history ∪ batch restricted to the batch (the q145 pin, through
    // the PIPELINE path).
    val scratch = TextDedup.removeRepeatedLines(
        hist.unionByName(batch), "doc_id", "text", minDf = 2)
      .where(col("doc_id") === 11L)
      .select("clean_text").as[String].head()
    assert(storedB(11L) == scratch)
    // Rebase consolidates the line counts into one summed slice.
    CurationRun.rebaseState(spark, s"$base/state_2", s"$base/state_r")
    val consolidated = graft.pipeline.StateLayout
      .readSlicePaths(spark, Seq(s"$base/state_r/line_df_batch"))
      .as[(Long, Long)].collect().toSet
    val viaSlices = graft.pipeline.StateLayout.readSlicePaths(spark,
        Seq(s"$base/state_1/line_df_batch", s"$base/state_2/line_df_batch"))
      .groupBy(col("h")).agg(sum(col("n_docs")).as("n_docs"))
      .as[(Long, Long)].collect().toSet
    assert(consolidated == viaSlices)
  }

  test("all four state cadences composed: init + two increments == scratch; retrain rebase == fresh semantic front (VERDICT r08 item 4)") {
    import graft.operators.VectorSim
    // Fixture with attrition planted at EVERY stage, df-aligned so the
    // staged cadence equals a scratch run: the footer line and the
    // 12-token boilerplate run both reach df >= 2 WITHIN batch 0 (so
    // prefix-df cleaning == full-df cleaning for every batch), the
    // near-dup pair (15, 4) is 7 tokens (no span grams) with distinct
    // line content (line dedup must not eat it), and the semantic pair
    // (3, 8) shares an exact embedding while every other cosine stays
    // under the 0.9 threshold.
    val boiler = "this content is provided under the creative commons " +
      "attribution license terms only"
    val footer = "footer one two three four"
    val b0 = Seq(
      (3L, s"unique river stones rest beside ancient wooden docks\n$footer"),
      (6L, s"morning light climbs across tall mountain peaks slowly\n$footer"),
      (9L, s"alpha opening words here $boiler closing alpha remarks"),
      (12L, s"beta opening different words $boiler closing beta remarks"),
      (15L, "alpha beta gamma delta epsilon theta kappa")
    ).toDF("doc_id", "text")
    val b1 = Seq(
      (1L, s"gamma prelude tokens $boiler gamma ending words"),
      (4L, "alpha beta gamma delta epsilon theta lambda"),
      (7L, s"seventh doc speaks of green meadows and quiet ponds\n$footer"),
      (10L, "pack my box with five dozen liquor jugs tonight")
    ).toDF("doc_id", "text")
    val b2 = Seq(
      (2L, s"final batch opening $boiler final words two"),
      (5L, s"fifth document about winter storms and icy windows\n$footer"),
      (8L, "octave doc singing about distant stars and planets")
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, benchText)).toDF("doc_id", "text")
    val emb = Seq(
      (3L, Seq(1f, 0f, 0f, 0f)), (8L, Seq(1f, 0f, 0f, 0f)),
      (6L, Seq(0f, 1f, 0f, 0f)), (9L, Seq(0f, 0f, 1f, 0f)),
      (12L, Seq(0f, 0f, 0f, 1f)), (15L, Seq(1f, 1f, 0f, 0f)),
      (1L, Seq(0f, 1f, 1f, 0f)), (4L, Seq(0f, 0f, 1f, 1f)),
      (7L, Seq(1f, 0f, 0f, 1f)), (5L, Seq(1f, 0f, 1f, 0f)),
      (2L, Seq(0f, 1f, 0f, 1f))).toDF("vec_id", "embedding")

    val base = TestSpark.tmpDir("all_state_cadence")
    def init(docs: org.apache.spark.sql.DataFrame, out: String, st: String,
        centroidsIn: Option[String], ann: Boolean) =
      CurationRun.runInit(docs, benchmark, out, st,
        minQuality = 0.0, dedupThreshold = 0.25, minContaminatedShingles = 1,
        defaultFraction = 1.0, packBudget = 64L, publishSpan = 8L,
        embeddings = Some(emb), semClusters = 2, semIters = 2,
        semThreshold = 0.9,
        semanticState = true, semSalt = 1, semCentroidsIn = centroidsIn,
        annState = ann, annSubspaces = 2, annCodewords = 2,
        annClusters = 2, annIters = 2,
        spanState = true, spanK = 8, spanMinDf = 2,
        lineState = true, lineMinDf = 2)
    def inc(docs: org.apache.spark.sql.DataFrame, out: String,
        stIn: String, stOut: String) =
      CurationRun.runIncremental(docs, benchmark, out, stIn, stOut,
        minQuality = 0.0, dedupThreshold = 0.25, minContaminatedShingles = 1,
        defaultFraction = 1.0, packBudget = 64L, publishSpan = 8L,
        embeddings = Some(emb), semClusters = 2, semIters = 2,
        semThreshold = 0.9, spanK = 8, spanMinDf = 2, lineMinDf = 2)

    val st0 = init(b0, s"$base/out0", s"$base/state0", None, ann = true)
    val st1 = inc(b1, s"$base/out1", s"$base/state0", s"$base/state1")
    val st2 = inc(b2, s"$base/out2", s"$base/state1", s"$base/state2")

    // Nonzero attrition at every active stage, every week it is due.
    assert(st0.lineCleaned >= 1 && st1.lineCleaned >= 1 && st2.lineCleaned >= 1,
      s"line stage must cut every week: $st0 / $st1 / $st2")
    assert(st0.spanCleaned >= 1 && st1.spanCleaned >= 1 && st2.spanCleaned >= 1,
      s"span stage must cut every week: $st0 / $st1 / $st2")
    assert(st1.decontaminated == 8,
      s"9 composed docs minus the contaminated one: $st1")
    assert(st1.kept < st1.decontaminated,
      s"the (15, 4) near-dup pair must lose a member: $st1")
    assert(st2.semDropped >= 1,
      s"the (3, 8) embedding pair must lose a member: $st2")

    // Composed == scratch across ALL FOUR states at once. Scratch
    // replays under the cadence's FROZEN quantizer (semCentroidsIn) —
    // the frozen-model contract's scratch twin; text-side equality
    // holds because every planted df crosses its threshold within
    // batch 0 already.
    init(b0.unionByName(b1).unionByName(b2), s"$base/outS", s"$base/stateS",
      Some(s"$base/state2/sem_centroids"), ann = false)
    def curated(dir: String): Set[(Long, String, String, Double)] =
      spark.read.parquet(s"$dir/curated")
        .select("doc_id", "text", "detected_lang", "quality_score")
        .as[(Long, String, String, Double)].collect().toSet
    assert(curated(s"$base/out2") == curated(s"$base/outS"),
      "composed curated corpus must equal the scratch run's")
    def pairsOf(paths: Seq[String]): Set[(Long, Long)] =
      graft.pipeline.StateLayout.readSlicePaths(spark, paths)
        .as[(Long, Long)].collect().toSet
    def dfOf(paths: Seq[String]): Set[(Long, Long)] =
      graft.pipeline.StateLayout.readSlicePaths(spark, paths)
        .groupBy(col("h")).agg(sum(col("n_docs")).as("n_docs"))
        .as[(Long, Long)].collect().toSet
    val cadence = Seq(s"$base/state0", s"$base/state1", s"$base/state2")
    assert(dfOf(cadence.map(_ + "/span_grams_batch")) ==
      dfOf(Seq(s"$base/stateS/span_grams_batch")), "span df slices")
    assert(dfOf(cadence.map(_ + "/line_df_batch")) ==
      dfOf(Seq(s"$base/stateS/line_df_batch")), "line df slices")
    def hashes(paths: Seq[String]): Set[(Long, String)] =
      graft.pipeline.StateLayout.readSlicePaths(spark, paths)
        .as[(Long, String)].collect().toSet
    assert(hashes(cadence.map(_ + "/hash_batch")) ==
      hashes(Seq(s"$base/stateS/hash_batch")), "content-hash slices")
    assert(pairsOf(Seq(s"$base/state2/clusters")) ==
      pairsOf(Seq(s"$base/stateS/clusters")), "near-dup labels")
    assert(pairsOf(cadence.map(_ + "/sem_cells_batch")) ==
      pairsOf(Seq(s"$base/stateS/sem_cells_batch")), "semantic cells")
    assert(pairsOf(Seq(s"$base/state2/sem_clusters")) ==
      pairsOf(Seq(s"$base/stateS/sem_clusters")), "semantic labels")
    // ANN codes: the composed slices equal a scratch encode of the
    // composed decon vectors under the state's frozen model.
    val (m2, cen2) = VectorSim.annModelFromFrame(
      spark.read.parquet(s"$base/state2/ann_model"))
    val composedVecs = StateLayout.readSlicePaths(spark,
        cadence.map(_ + "/decon_batch"))
      .select(col("doc_id"))
      .join(emb.select(col("vec_id"), col("embedding")),
        col("doc_id") === col("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val expectCodes = VectorSim.annCodesFrame(composedVecs, m2, cen2)
    val gotCodes = graft.pipeline.StateLayout.readSlicePaths(spark,
      cadence.map(_ + "/ann_codes_batch"))
    assert(gotCodes.except(expectCodes).isEmpty &&
      expectCodes.except(gotCodes).isEmpty,
      "composed ANN code slices must equal a scratch encode under the frozen model")

    // Rebase WITH retrain over the composed four-state state: the
    // semantic front re-trains on the COMPOSED decon vectors (equal to
    // a fresh unseeded init over the composed corpus), the text-side
    // df/hash states consolidate losslessly, and the ANN artifact
    // consolidates as pure IO under the CARRIED model.
    CurationRun.rebaseState(spark, s"$base/state2", s"$base/stateR",
      retrainSemantic = true, embeddings = Some(emb),
      semClusters = 2, semIters = 2, semThreshold = 0.9, semSalt = 1)
    init(b0.unionByName(b1).unionByName(b2), s"$base/outF", s"$base/stateF",
      None, ann = false)
    def cenRows(d: String): Set[(Int, Seq[Double])] =
      spark.read.parquet(s"$d/sem_centroids")
        .as[(Int, Seq[Double])].collect().toSet
    assert(cenRows(s"$base/stateR") == cenRows(s"$base/stateF"),
      "retrain rebase must train the same quantizer a fresh init would")
    assert(pairsOf(Seq(s"$base/stateR/sem_cells_batch")) ==
      pairsOf(Seq(s"$base/stateF/sem_cells_batch")))
    assert(pairsOf(Seq(s"$base/stateR/sem_clusters")) ==
      pairsOf(Seq(s"$base/stateF/sem_clusters")))
    assert(dfOf(Seq(s"$base/stateR/span_grams_batch")) ==
      dfOf(Seq(s"$base/stateF/span_grams_batch")))
    assert(dfOf(Seq(s"$base/stateR/line_df_batch")) ==
      dfOf(Seq(s"$base/stateF/line_df_batch")))
    assert(hashes(Seq(s"$base/stateR/hash_batch")) ==
      hashes(Seq(s"$base/stateF/hash_batch")))
    assert(pairsOf(Seq(s"$base/stateR/clusters")) ==
      pairsOf(Seq(s"$base/state2/clusters")), "labels copy forward")
    val rebCodes = graft.pipeline.StateLayout
      .readSlice(spark, s"$base/stateR/ann_codes_batch")
    assert(rebCodes.except(gotCodes).isEmpty &&
      gotCodes.except(rebCodes).isEmpty,
      "ANN codes consolidate as pure IO")
    assert(spark.read.parquet(s"$base/stateR/ann_model").collect().toSet ==
      spark.read.parquet(s"$base/state2/ann_model").collect().toSet,
      "the frozen ANN model carries forward unchanged")
  }
}
