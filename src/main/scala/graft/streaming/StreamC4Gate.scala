package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Streaming C4 line-level cleaning — the live twin of
  * [[graft.operators.TextAnalysis.c4LineFilter]] (Raffel et al. 2020
  * §2.2): the same per-line keep rule (>= minWords words, terminal
  * punctuation), the same page gates (>= minLines kept lines, no
  * curly brace, no "lorem ipsum"), applied at ingest.
  *
  * STATELESS by construction: where the batch operator explodes lines
  * and re-aggregates per doc (the codegen-friendly shape for a corpus
  * pass), the stream form evaluates the identical rules as per-ROW
  * array expressions — no shuffle, no state store, no watermark, so
  * output is trivially micro-batch-boundary-invariant and every doc
  * gates the moment it arrives (the [[StreamBloomGate]] discipline).
  * Value parity with the batch operator is spec-pinned. */
object StreamC4Gate {

  private def keepLine(l: Column, minWords: Int): Column =
    size(tokens(l)) >= minWords && substring(l, -1, 1).isin(".", "!", "?")

  /** Clean a document stream. Output columns match the batch
    * operator: (doc_id, n_lines, n_kept, cleaned_text, keep). */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5, minLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => keepLine(l, minWords))
    docs.select(
      col(idCol).as("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, "\n").as("cleaned_text"),
      (size(kept) >= minLines &&
        !(col(textCol).contains("{") ||
          lower(col(textCol)).contains("lorem ipsum"))).cast("int").as("keep"))
  }
}
