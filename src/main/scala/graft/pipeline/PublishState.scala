package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DataMix, TextAnalysis}

/** Delta-publish state for the weekly cadences (VERDICT r10 item 1):
  * the machinery that makes the weekly PUBLISH cost track the batch,
  * now that compute and state reads already do.
  *
  * The published corpus (curated + packed + manifest) is, by
  * construction, a pure per-shard function of the MEMBER-doc set:
  * shard = doc_id div publishSpan — RANGE sharding, so a
  * monotonic-id weekly batch lands in its OWN new shards and an old
  * shard changes only when a member actually leaves or re-surfaces
  * (modulo sharding would spray one doc into every shard and mark
  * the whole publish changed every week); a doc's curated row (text, lang,
  * quality) is frozen at ingest (landed decon text is never
  * rewritten); packing within a shard is an id-ordered prefix sum of
  * exactly the shard's members; the manifest row is an aggregate of
  * the shard's bins. So the weekly re-publish only NEEDS to touch
  * shards whose member set changed — everything else is the same
  * bytes under a new version.
  *
  * Two state artifacts make the diff computable without re-deriving
  * the corpus-scale kept set:
  *
  *  - `publish_ledger_batch/` — one row per landed decon doc
  *    (doc_id, quality_score, detected_lang, n_tokens, sampled, surv,
  *    semok, member, shard, v), plain slices (the only reader is the
  *    full latest-wins compose). `sampled` is the
  *    doc's deterministic md5 draw ([[DataMix.sampleKeepExpr]] — a
  *    pure per-(id, lang) function, so it never changes for an old
  *    doc); `surv` is dedup-survivor status; `semok` the semantic
  *    disposition (true when the doc carries no semantic label);
  *    `member` = surv && semok && sampled — exactly "row appears in
  *    curated". Slices land per increment with only the batch's rows
  *    plus CORRECTED rows for old docs whose flags changed; readers
  *    compose latest-wins on `v` (the lineage position). Flags can
  *    change only inside dedup/semantic clusters touched by the batch
  *    — every new LSH / semantic pair is batch-incident — so the
  *    correction set is batch-scale (see
  *    [[CurationRun.runIncremental]]'s delta branch for the flag
  *    recompute that mirrors the full path's survivor rules).
  *  - `publish_shards/` — per-shard membership fingerprints
  *    (shard, n_member, fp) where fp is the exact decimal sum of
  *    xxhash64(doc_id, n_tokens) over members. The increment diffs
  *    recomputed fingerprints against the stored ones; shards that
  *    match are carried forward as pure IO (hard links to the
  *    previous publish's per-shard files), shards that differ re-pack
  *    from batch text + the previous curated shard + (for the rare
  *    re-surfacing doc) a doc-pruned decon read.
  *  - `publish_meta.txt` — the publish config fingerprint (a config
  *    change invalidates the per-doc `sampled` flags and the shard
  *    function, so the increment falls back to a full re-publish and
  *    rebuilds this state) and the previous publish's outDir (the
  *    hard-link source).
  *
  * The ledger is METADATA-scale (tens of bytes per doc — the same
  * regime as the full cluster-label table the cadence already
  * maintains), so composing it weekly is a narrow shuffle, never a
  * text read. The TEXT IO of a weekly publish is batch + changed
  * shards; DeltaPublishSpec pins delta == full re-publish bit-equal
  * (row sets AND audit stats) across increments, and ScaleStress
  * measures the flat-vs-growing IO contrast.
  */
object PublishState {

  /** Publish parameters that determine membership and sharding. */
  final case class Config(fractions: Map[String, Double],
      defaultFraction: Double, packBudget: Long, publishSpan: Long) {
    def fingerprint: String =
      fractions.toSeq.sortBy(_._1).map { case (k, f) => s"$k=$f" }
        .mkString(",") +
        s";default=$defaultFraction;budget=$packBudget;span=$publishSpan"
    /** The shard of a doc id — shared by every publish consumer. */
    def shardOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(id / lit(publishSpan)).cast("int")
  }

  private def metaPath(stateDir: String) =
    java.nio.file.Paths.get(s"$stateDir/publish_meta.txt")

  def active(stateDir: String): Boolean =
    java.nio.file.Files.exists(metaPath(stateDir))

  /** (config fingerprint, previous publish outDir). */
  def readMeta(stateDir: String): (String, String) = {
    val lines = java.nio.file.Files.readString(metaPath(stateDir))
      .split("\n", -1)
    (lines(0), lines(1))
  }

  def writeMeta(stateDir: String, cfg: Config, outDir: String): Unit =
    writeMetaRaw(stateDir, cfg.fingerprint, outDir)

  /** Raw form for the rebase's carry-forward (the config fingerprint
    * copies verbatim; a rebase does not publish). */
  def writeMetaRaw(stateDir: String, fingerprint: String,
      outDir: String): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(stateDir))
    java.nio.file.Files.writeString(metaPath(stateDir),
      s"$fingerprint\n$outDir\n")
  }

  /** Per-doc publish metadata for one decon frame (doc_id, text,
    * quality_score): language, token count, the deterministic sample
    * draw, and the shard — every column a pure function of the landed
    * row, computed ONCE at ingest and frozen in the ledger. */
  def baseRows(decon: DataFrame, cfg: Config): DataFrame = {
    import graft.functions.TextFunctions.tokens
    decon
      .join(TextAnalysis.languageId(decon, "doc_id", "text")
        .select(col("doc_id"), col("detected_lang")), "doc_id")
      .select(col("doc_id"), col("quality_score"), col("detected_lang"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        DataMix.sampleKeepExpr(col("doc_id"), col("detected_lang"),
          cfg.fractions, cfg.defaultFraction).as("sampled"),
        cfg.shardOf(col("doc_id")).as("shard"))
  }

  private val LedgerValueCols = Seq("quality_score", "detected_lang",
    "n_tokens", "sampled", "surv", "semok", "member", "shard")

  /** Land one increment's ledger rows (batch + corrections) as a
    * slice at lineage position `v`. PLAIN parquet, not the bucketed
    * layout: the ledger's only reader is the latest-wins COMPOSE
    * (which must see every slice in full — the fingerprint recompute
    * and the audit counts are whole-corpus aggregates), so key
    * bucketing would pay sort + many-file commits for a prune no
    * consumer performs (measured: the bucketed form cost ~0.7 s per
    * cadence write at sf0.1 for zero read benefit). */
  def writeLedgerSlice(rows: DataFrame, stateOutDir: String, v: Long): Unit =
    graft.sources.Sinks.overwriteParquet(
      rows.select((col("doc_id") +: LedgerValueCols.map(col) :+
        lit(v).as("v")): _*),
      s"$stateOutDir/publish_ledger_batch", numFiles = 2)

  /** Latest-wins composition of the ledger slices along a lineage:
    * one row per doc, the row from the slice with the highest `v`
    * (struct max keyed on v — corrections override, batch rows are
    * new ids). Narrow corpus-rows shuffle, no text. Lineage dirs
    * written before the publish state existed carry no slice and are
    * skipped — exact, because the first slice ever written (init or
    * the fallback rebuild) covers every composed doc. */
  def composeLedger(spark: SparkSession, lineage: Seq[String]): DataFrame =
    StateLayout.readSlices(spark,
        lineage.filter(d => java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$d/publish_ledger_batch"))),
        "publish_ledger_batch")
      .groupBy(col("doc_id"))
      .agg(max(struct((col("v") +: LedgerValueCols.map(col)): _*))
        .as("__r"))
      .select(col("doc_id") +: LedgerValueCols.map(c => col(s"__r.$c")): _*)

  /** Per-shard membership fingerprints of a composed ledger. */
  def fingerprintsOf(ledger: DataFrame): DataFrame =
    ledger.where(col("member"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_member"),
        sum(xxhash64(col("doc_id"), col("n_tokens")).cast("decimal(38,0)"))
          .as("fp"))

  def writeFingerprints(spark: SparkSession, fps: DataFrame,
      stateOutDir: String): Unit =
    graft.sources.Sinks.overwriteParquet(fps,
      s"$stateOutDir/publish_shards", numFiles = 1)

  def readFingerprints(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/publish_shards")

  // -----------------------------------------------------------------
  // Sharded publish layout: every publish artifact lands as FLAT
  // per-shard parquet files named `shard-<n>-<part>.parquet`, so an
  // increment can carry an unchanged shard's files forward as pure IO
  // (hard links — the local-FS stand-in for an object-store copy /
  // manifest re-point) and re-derive only the changed ones. Flat
  // files, not `shard=` dirs: a hive-partitioned layout would add a
  // `shard` column to every read-back, changing the published schema.
  // -----------------------------------------------------------------

  /** Empty-and-recreate a publish artifact dir (the delta branch
    * prepares the target before linking carried shards into it). */
  private[pipeline] def prepareDir(path: String): Unit = clearDir(path)

  private def clearDir(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
      finally s.close()
    }
    java.nio.file.Files.createDirectories(p)
  }

  /** Write `df` (carrying an int `shard` column) as per-shard flat
    * files under `path`. `keepShardInContent` controls whether the
    * shard column stays in the rows (packed bins carry it; curated
    * does not). Stages through a partitionBy write — each shard's
    * rows land wholly inside its own files — then moves the files to
    * the flat `shard-<n>-` names. With `clear = false` the target
    * dir's existing files (an increment's carried links) are kept.
    * A write that lands NO rows falls back to one plain empty file so
    * read-back keeps a schema (the [[StateLayout.writeBucketed]]
    * stance), unless carried files already give the dir one. */
  def writeSharded(df: DataFrame, path: String,
      keepShardInContent: Boolean, clear: Boolean = true): Unit = {
    val staged = s"${path}__staged"
    val d =
      if (keepShardInContent) df.withColumn("__pub_shard", col("shard"))
      else df.withColumnRenamed("shard", "__pub_shard")
    d.repartition(col("__pub_shard"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("__pub_shard").parquet(staged)
    if (clear) clearDir(path)
    else java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    moveShardFiles(staged, path)
    val hasData = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(path))
      try s.anyMatch(_.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
    if (!hasData)
      graft.sources.Sinks.overwriteParquet(
        if (keepShardInContent) df else df.drop("shard"), path, numFiles = 1)
  }

  /** Move a staged partitionBy write's files into `path` under flat
    * `shard-<n>-` names, then drop the staging dir. Exposed at
    * pipeline scope so the delta branch can stage a PARTIAL write
    * (changed shards only) into a directory that already holds the
    * carried links. */
  private[pipeline] def moveShardFiles(staged: String, path: String): Unit = {
    val sp = java.nio.file.Paths.get(staged)
    val dirs = java.nio.file.Files.list(sp)
    try dirs.filter(_.getFileName.toString.startsWith("__pub_shard="))
      .forEach { dir =>
        val n = dir.getFileName.toString.stripPrefix("__pub_shard=")
        val files = java.nio.file.Files.list(dir)
        try files.filter(_.getFileName.toString.endsWith(".parquet"))
          .forEach { f =>
            java.nio.file.Files.move(f, java.nio.file.Paths.get(
              s"$path/shard-$n-${f.getFileName}"))
          }
        finally files.close()
      }
    finally dirs.close()
    clearDir(staged)
    java.nio.file.Files.delete(java.nio.file.Paths.get(staged))
  }

  /** The flat per-shard files of one artifact dir. */
  def shardFiles(path: String, shard: Int): Seq[String] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return Nil
    val s = java.nio.file.Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.startsWith(s"shard-$shard-"))
        .map(_.toString).toSeq
    } finally s.close()
  }

  /** Hard-link `shards`' files from the previous publish into the new
    * one — pure IO carry-forward, zero bytes rewritten. */
  def linkShards(prevPath: String, path: String, shards: Seq[Int]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    shards.foreach { n =>
      shardFiles(prevPath, n).foreach { f =>
        val src = java.nio.file.Paths.get(f)
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(s"$path/${src.getFileName}"), src)
      }
    }
  }

  /** Hard-link every per-shard file of the previous publish EXCEPT the
    * changed shards' — the delta carry under open-ended range shard
    * ids (the carry set is "whatever the previous publish had, minus
    * the diff", enumerated from its files, not a 0-until-N range). */
  def linkShardsExcept(prevPath: String, path: String,
      changed: Set[Int]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    val pp = java.nio.file.Paths.get(prevPath)
    if (!java.nio.file.Files.exists(pp)) return
    val Named = """shard-(-?\d+)-.*""".r
    val s = java.nio.file.Files.list(pp)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.foreach { f =>
        f.getFileName.toString match {
          case Named(n) if !changed.contains(n.toInt) =>
            java.nio.file.Files.createLink(
              java.nio.file.Paths.get(s"$path/${f.getFileName}"), f)
          case _ => ()
        }
      }
    } finally s.close()
  }
}
