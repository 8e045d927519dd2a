package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.operators.{DataMix, TextAnalysis, TextDedup}

/** Composed STREAMING curation pipeline — the live counterpart of
  * [[graft.pipeline.CurationRun]]'s front half. Every stage is the
  * SAME definition the batch operators use, inlined as columns so the
  * whole pipeline is one stateless map chain plus exactly one
  * stateful operator: [[TextAnalysis.redactedText]] (redaction
  * rewrite), [[TextAnalysis.qualityScoreCol]] (one kernel call),
  * `dropDuplicatesWithinWatermark` on the shared
  * [[graft.operators.TextDedup.contentHash]], and the deterministic
  * md5-bucket stratified sample (retry-safe on a stream for the same
  * reason it is retry-safe in batch — no rand()). No STREAM-STREAM
  * joins anywhere — a join-shaped composition of the batch operators
  * would turn into self-joins and state the pipeline doesn't need;
  * the optional semantic gate is the one join and it is the supported
  * stateless stream-STATIC shape ([[StreamSemanticGate]]).
  *
  * What deliberately stays BATCH: near-dup clustering and survivor
  * selection (transitive closure needs the whole pair graph —
  * [[StreamNearDup]] emits candidates for a downstream batch pass)
  * and sequence packing (bin assignment depends on every earlier doc
  * in the shard). The streaming tier lands clean, first-seen,
  * sampled documents; the periodic batch run compacts them
  * ([[graft.operators.TextDedup.connectedComponentsIncremental]]).
  *
  * State: one content hash per kept document inside the watermark
  * horizon; exact duplicates farther apart than `delay` are the batch
  * compaction's job (the [[StreamDedup]] contract).
  */
object StreamCuration {

  /** Stream of (doc_id, ts, text, quality_score, detected_lang) rows
    * that pass the quality gate (and, when a collected classifier
    * model is supplied, the model-based gate — the
    * [[graft.functions.expr.ClassifierScore]] kernel keeps it a pure
    * map stage, no stream-static join needed), are the first sighting
    * of their normalized content within the horizon, and survive the
    * deterministic sample.
    *
    * When the stream carries an embedding column and `semantic` state
    * is supplied (the [[StreamSemanticGate.stateCells]] frame + the
    * frozen quantizer + threshold/salt), paraphrase-level duplicates
    * of the composed corpus state are dropped too — cell assignment
    * stays a pure map expression and the duplicate test is the
    * supported stream-static anti join, so the chain stays
    * single-stateful-operator (the dedup watermark). */
  def curate(docs: DataFrame, idCol: String, textCol: String, tsCol: String,
      delay: String, minQuality: Double = 0.5,
      fractions: Map[String, Double] = Map.empty,
      defaultFraction: Double = 1.0,
      classifier: Option[graft.functions.expr.ClassifierWeights] = None,
      minClassifierScore: Double = 0.5,
      semantic: Option[(DataFrame, Seq[Array[Double]], Double, Int)] = None,
      embCol: String = "embedding"): DataFrame = {
    val base = semantic match {
      case None => docs
        .select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
          TextAnalysis.redactedText(col(textCol)).as("text"))
      case Some(_) => docs
        .select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
          TextAnalysis.redactedText(col(textCol)).as("text"),
          col(embCol))
    }
    val gated = base
      .withColumn("quality_score", TextAnalysis.qualityScoreCol(col("text")))
      .where(col("quality_score") >= minQuality)
    val modelGated = classifier match {
      case None => gated
      case Some(m) => gated.where(
        graft.operators.QualityClassifier.scoreCol(tokens(col("text")), m) >=
          minClassifierScore)
    }
    val semGated = semantic match {
      case None => modelGated
      case Some((state, cen, threshold, salt)) =>
        StreamSemanticGate.gateFilter(modelGated, state, cen, threshold,
          salt, idCol = "doc_id", embCol = embCol).drop(embCol)
    }
    val curated = semGated
      .withColumn("content_hash", TextDedup.contentHash(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("content_hash")
      .withColumn("detected_lang", TextAnalysis.detectedLang(tokens(col("text"))))
    DataMix.stratifiedSample(curated, "doc_id", "detected_lang",
      fractions, defaultFraction)
  }
}
