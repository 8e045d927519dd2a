package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for training-data curation (LLM-data-pipeline
  * tier): token counting, quality scoring, language ID, fingerprinting.
  *
  * All pure per-row expression pipelines — no shuffle at all; at 100 TB
  * these run as a single map pass fused into the parquet scan by
  * whole-stage codegen.
  */
object TextAnalysis {

  /** Stopword markers per language for the n-gram/stopword heuristic
    * language identifier. Tiny on purpose: the point is the operator
    * shape (per-token set membership + argmax), not lexicon quality. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "un"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Token counts: whitespace tokens plus a BPE-ish regex segmentation
    * (letter runs | digits | single punctuation) — the classic cheap
    * proxy for subword token counts. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      size(toks).as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).as("n_bpe_tokens"),
      size(array_distinct(toks)).as("n_distinct_tokens"))
  }

  /** Heuristic quality score in [0,1]: length band, type-token ratio,
    * mean token length band, stopword presence. Deterministic arithmetic
    * only (no float functions whose rounding could differ per engine). */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val nChars = length(col(textCol)).cast("double")
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val meanTokLen = (nChars - (nTok - 1)) / nTok // single-space joined
    val stopRatio = countIn(toks, langMarkers.flatMap(_._2)).cast("double") / nTok
    docs.select(
      col(idCol).as("doc_id"),
      nTok.cast("int").as("n_tokens"),
      round(ttr, 6).as("type_token_ratio"),
      round(meanTokLen, 6).as("mean_token_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(
        when(nTok >= 20 && nTok <= 2000, 0.25).otherwise(0.0) +
          when(ttr >= 0.3, 0.25).otherwise(0.0) +
          when(meanTokLen >= 3.0 && meanTokLen <= 10.0, 0.25).otherwise(0.0) +
          when(stopRatio > 0.0, 0.25).otherwise(0.0),
        2).as("quality_score"))
  }

  /** Language ID: count marker-word hits per language, pick the argmax
    * (ties and zero evidence -> "und", ISO 639-3 undetermined). The CASE
    * chain encodes a fixed preference order so the pick is deterministic
    * and oracle-reproducible. */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val hits = langMarkers.map { case (l, ws) => l -> countIn(toks, ws) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    // First match in declared order wins ties (en > es > de > fr);
    // zero marker evidence -> "und" (ISO 639-3 undetermined).
    val pick = hits.foldRight(lit("und"): Column) { case ((l, c), els) =>
      when(c === best && best > 0, lit(l)).otherwise(els)
    }
    docs.select(
      (Seq(col(idCol).as("doc_id")) ++
        hits.map { case (l, c) => c.as(s"hits_$l") } :+
        pick.as("detected_lang")): _*)
  }

  /** Content fingerprints: md5 + 1-hash MinHash over char 5-grams. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      contentFingerprint(col(textCol), 5).getField("md5").as("md5_hash"),
      contentFingerprint(col(textCol), 5).getField("min_shingle_hash").as("min_shingle_hash"))
}
