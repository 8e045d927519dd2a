package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Keyword retrieval over the document corpus — the lexical half of
  * hybrid (keyword + vector) search. Fully relational BM25: no score
  * is computed for a (doc, term) pair that never co-occurs, so the
  * work is proportional to postings of the query terms, not the
  * corpus.
  */
object TextSearch {

  /** BM25 top-k for a bag of query terms (Robertson/Sparck Jones
    * idf with the standard +1 floor; k1/b defaults).
    *
    * Shape at scale: tokens are exploded once; rows are FILTERED to
    * the query terms before any aggregation (postings, not corpus);
    * document lengths and the global (N, avgdl) stats are broadcast
    * scalars; the final ranking is the bounded [[graft.functions.expr.TopKByScore]]
    * aggregate — no sort of the scored postings.
    *
    * Determinism across engines: per-term scores round to 8dp before
    * the per-doc sum (collapsing last-ulp `ln`/division differences),
    * the summed score rounds to 6dp before ranking, ties break on
    * doc_id — the DuckDB oracle replays the identical arithmetic. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
    val dl = terms.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = terms
      .where(col("tok").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    scoreBm25(tf, dl, stats, topK, k1, b)
  }

  /** The BM25 scoring tail over prepared frames — `tf` (doc_id, tok,
    * tf: the query terms' term frequencies), `dl` (doc_id, dl), and a
    * one-row `stats` (n_docs, avgdl). [[bm25]] derives them from a
    * corpus pass; [[graft.pipeline.Bm25State]]'s serving side derives
    * them from composed postings state read pruned to the query's
    * terms. ONE definition of the arithmetic (8dp-rounded term scores,
    * exact decimal doc sum, 6dp final round, deterministic top-k), so
    * the two forms cannot drift — their bit-equality is
    * Bm25StateSpec's pin and the q149 oracle's premise. */
  private[graft] def scoreBm25(tf: DataFrame, dl: DataFrame,
      stats: DataFrame, topK: Int, k1: Double, b: Double): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val termScore = round(
      idf * (col("tf") * (k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 8)
    val scored = tf
      .join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      // Decimal sum of the 8dp-rounded term scores: exact, so the
      // score is aggregation-order- and engine-invariant even when a
      // doc's total sits on the 6dp rounding boundary (NOTES finding
      // #18 — the LM operator hit this with a double sum).
      .agg(round(sum(termScore.cast("decimal(20,8)")).cast("double"), 6)
        .as("score"))
    val agg = ColumnBridge.column(graft.functions.expr.TopKByScore(
      ColumnBridge.expression(col("score")),
      ColumnBridge.expression(col("doc_id")), topK).toAggregateExpression())
    scored.agg(agg.as("topk"))
      .select(posexplode(col("topk")).as(Seq("pos", "e")))
      .select(
        (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("doc_id"),
        col("e.score").as("score"))
  }

  /** Reciprocal-rank fusion of two ranked lists (hybrid search:
    * lexical + vector): rrf(d) = sum over systems of 1/(c + rank_d),
    * absent-from-one-system treated as contributing 0. Integer ranks
    * in, one fixed-order double add — deterministic on any engine.
    * Inputs need (id, rank) columns; output re-ranks by (rrf DESC,
    * id) via the bounded top-k aggregate. */
  def rrfFuse(a: DataFrame, b: DataFrame, topK: Int, c: Int = 60): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val fa = a.select(col("id"), col("rank").as("rank_a"))
    val fb = b.select(col("id"), col("rank").as("rank_b"))
    val fused = fa.join(fb, Seq("id"), "full_outer")
      .select(col("id"),
        round(
          coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0)), 6).as("rrf"))
    val agg = ColumnBridge.column(graft.functions.expr.TopKByScore(
      ColumnBridge.expression(col("rrf")),
      ColumnBridge.expression(col("id")), topK).toAggregateExpression())
    fused.agg(agg.as("topk"))
      .select(posexplode(col("topk")).as(Seq("pos", "e")))
      .select(
        (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("doc_id"),
        col("e.score").as("rrf_score"))
  }
}
