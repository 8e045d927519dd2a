package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dot, norm}
import graft.operators.VectorSim

/** Streaming semantic-novelty gate — the live twin of the weekly
  * cadence's frozen-quantizer semantic stage
  * ([[graft.pipeline.CurationRun]] state cadences, VERDICT r06 item 3):
  * document embeddings arrive on a stream and only those that are NOT
  * a semantic (paraphrase-level) duplicate of the composed corpus
  * state pass. Fully STATELESS on the stream side:
  *
  *  - cell assignment under the FROZEN coarse quantizer is a pure
  *    map-tier expression (the centroid matrix rides as one referenced
  *    object, exactly as in batch), so it is stream-safe by
  *    construction — no shuffle, no state store, no watermark;
  *  - the duplicate test is a stream-static LEFT ANTI join against the
  *    (persisted) cell-keyed state embeddings: equi-join on the cell
  *    id, plus the rounded-cosine threshold as a residual join
  *    predicate. Spark's supported stream-static join shape — per
  *    micro-batch it probes the cached static side only.
  *
  * Semantics match the batch gate deliberately: novelty is judged
  * against STATE only (two paraphrases arriving in the same micro-batch
  * both pass — the weekly batch's within-batch pairs are the batch
  * cadence's job, same contract as [[StreamBloomGate]] for exact dups).
  * The quantizer prunes exactly like the batch pair generation: a
  * paraphrase that lands in a different cell than its state twin is
  * not scored (the same recall-for-bound trade, spec-pinned equal to
  * the batch machinery's decision on identical input).
  */
object StreamSemanticGate {

  /** Cell-keyed state embeddings under the frozen quantizer — build
    * once from the composed corpus state, persist, reuse across the
    * stream's lifetime (the [[StreamBloomGate.historyKeys]] contract).
    * Columns: (s_id, cell, s_emb, s_norm). */
  def stateCells(stateEmb: DataFrame, cen: Seq[Array[Double]],
      salt: Int = 1): DataFrame =
    VectorSim.withSemanticCell(stateEmb, cen, salt)
      .select(col("vec_id").as("s_id"), col("cell"),
        col("embedding").as("s_emb"), norm(col("embedding")).as("s_norm"))

  /** Semantically novel documents on the stream: one (vec_id, cell)
    * row per arriving embedding with NO state vector in its cell at
    * cosine >= threshold — identical rows to the batch anti-join over
    * the same data. */
  def novel(stream: DataFrame, state: DataFrame, cen: Seq[Array[Double]],
      threshold: Double, salt: Int = 1): DataFrame = {
    val assigned = VectorSim.withSemanticCell(stream, cen, salt)
      .select(col("vec_id"), col("cell"),
        col("embedding").as("q_emb"), norm(col("embedding")).as("q_norm"))
    val cos = round(dot(col("q_emb"), col("s_emb")) /
      (col("q_norm") * col("s_norm")), 6)
    assigned.join(state,
        assigned("cell") === state("cell") && cos >= lit(threshold),
        "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  /** The gate as a column-preserving FILTER stage, for composing into
    * a wider streaming chain ([[StreamCuration.curate]]'s optional
    * semantic stage): rows whose `embCol` embedding has a same-cell
    * state vector at cosine >= threshold are dropped; every input
    * column passes through unchanged. Same decision as [[novel]] —
    * only the projection differs. */
  def gateFilter(stream: DataFrame, state: DataFrame,
      cen: Seq[Array[Double]], threshold: Double, salt: Int = 1,
      idCol: String = "doc_id", embCol: String = "embedding"): DataFrame = {
    val withCell = VectorSim
      .withSemanticCell(stream, cen, salt, idCol, embCol)
      .withColumn("__q_norm", norm(col(embCol)))
    val cos = round(dot(withCell(embCol), state("s_emb")) /
      (withCell("__q_norm") * state("s_norm")), 6)
    withCell.join(state,
        withCell("cell") === state("cell") && cos >= lit(threshold),
        "left_anti")
      .drop("cell", "__q_norm")
  }
}
