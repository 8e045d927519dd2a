package graft.operators

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** fastText-style model-based quality filter (Joulin et al. 2016;
  * the filtering family of GPT-3 appendix A, LLaMA, and FineWeb-Edu):
  * logistic regression over hashed unigram+bigram counts, positives =
  * a curated target corpus, negatives = the raw pool; the trained
  * model scores every candidate document and the score gates or
  * stratifies the corpus.
  *
  * This sits beside the repo's other two published quality-scoring
  * families — DSIR importance ratios ([[DataMix.importanceResample]])
  * and the CCNet perplexity LM ([[TextAnalysis.perplexityBuckets]]) —
  * and shares the DSIR feature space ([[DataMix.docBuckets]]).
  *
  * Training is FIXED-ITERATION full-batch gradient descent with an
  * 8dp decimal rounding at every engine boundary (per-doc sigmoid,
  * per-bucket update), so a run is bit-deterministic and the DuckDB
  * oracle replays it iteration by iteration (the q65 BPE merge-loop
  * discipline applied to model training).
  *
  * Scale shape: one corpus pass builds the hashed feature frame
  * (persisted across iterations); each iteration is two
  * map-side-combined groupBys (per-doc margin, per-bucket gradient)
  * against a BROADCAST weight table. Driver state is the weight
  * vector only — <= `buckets` rows, model state under the same
  * bounded-collect rule as k-means centroids and BPE merge tables,
  * never corpus rows. */
object QualityClassifier {

  private val weightSchema = StructType(Seq(
    StructField("b", LongType, nullable = false),
    StructField("w", DecimalType(20, 8), nullable = false)))

  private def weightsFrame(spark: SparkSession,
      w: Map[Long, JBigDecimal]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(w.toSeq.sortBy(_._1)
        .map { case (b, v) => Row(b, v.setScale(8)) }: _*),
      weightSchema)

  /** Per-doc 8dp-rounded sigmoid scores under a weight table:
    * z = sum(n * w) over the doc's hashed grams (exact decimal),
    * p = round(1/(1+e^-z), 8). Buckets without a trained weight
    * contribute zero (left join + coalesce). */
  private def docScores(feat: DataFrame, wDf: DataFrame): DataFrame =
    feat
      .join(broadcast(wDf), Seq("b"), "left")
      .withColumn("nw", col("n").cast("decimal(10,0)") *
        coalesce(col("w"), lit(0).cast("decimal(20,8)")))
      .groupBy(col("doc_id"))
      .agg(sum(col("nw")).as("z"))
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-col("z").cast("double"))), 8)
          .cast("decimal(20,8)").as("p"))

  /** Train the logistic model: `labeled` must carry a 0/1 `labelCol`.
    * Returns the weight table (b, w decimal(20,8)) — a writable
    * artifact frame (the q77 tokenizer-as-artifact shape), consumed
    * by [[score]].
    *
    * 100 TB posture: training runs over whatever `labeled` frame the
    * caller passes — production quality filters train on a BOUNDED
    * labeled sample (fastText-style filters use ~1e5..1e6 docs:
    * positives from the curated target, negatives drawn from the raw
    * pool with [[DataMix.stratifiedSample]]), then [[score]] /
    * [[scoreInline]] sweeps the full corpus. Nothing in the loop
    * requires the training set to be corpus-scale. */
  def train(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int, iters: Int = 3,
      lr: Double = 0.5): DataFrame = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in (0, 65536], got $buckets (driver holds one weight per bucket)")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = labeled.sparkSession
    // Spread before the feature explode (guide §2.5): the one-time
    // token-bucket materialization otherwise runs single-task over a
    // one-file bench input; GD updates are decimal-exact, so order
    // cannot perturb the weights.
    val spread = Spread.toCores(labeled)
    // Both training caches land HASH-PARTITIONED BY doc_id (guide
    // §2.4 — establish the partitioning once and let every pass reuse
    // it): each GD iteration groups scores by doc_id and joins
    // feat/p/lab on doc_id, so an unpartitioned cache pays two
    // corpus-feature exchanges per iteration; partitioned, the
    // per-iteration job's only exchange is the <= buckets-row gradient
    // aggregate. docBuckets' own agg keys by (doc_id, b) — a different
    // hash — hence the explicit repartition before persist.
    val feat = DataMix.docBuckets(spread, idCol, textCol, buckets)
      .repartition(col("doc_id")).persist()
    // (doc_id, y) is compact but its LINEAGE is the caller's full prep
    // chain (q146 hands a normalize-the-corpus join): uncached, the
    // update join below re-executes that chain once per GD iteration.
    // Measured on q146's trainer at sf0.1: post-warmup iterations run
    // ~1.3/0.8 s with this persist; the trainer's remaining cost
    // concentrates in the one-time feature materialization. Same
    // discipline as `feat`.
    val lab = spread.select(col(idCol).as("doc_id"),
      col(labelCol).cast("int").as("y"))
      .repartition(col("doc_id")).persist()
    // Internal bookkeeping actions run through `toRdd` throughout the
    // loop (the TextDedup.connectedComponents rationale): per-iteration
    // tracked SQL actions make AQE re-render the full plan string per
    // query stage — pure driver time that dominates small-SF training.
    val nDocs = lab.queryExecution.toRdd.count()
    var w: Map[Long, JBigDecimal] = Map.empty
    for (_ <- 1 to iters) {
      val p = docScores(feat, weightsFrame(spark, w))
      // Per-bucket update: u_b = round(lr * sum(n*(p-y)) / N, 8).
      // The sum is an exact decimal (order-invariant); the division
      // happens once in double on the exact total (q57 discipline).
      val upd = feat
        .join(p, Seq("doc_id"))
        .join(lab, Seq("doc_id"))
        .groupBy(col("b"))
        .agg(sum(col("n").cast("decimal(10,0)") * (col("p") - col("y")))
          .as("gsum"))
        .select(col("b"),
          round(lit(lr) * col("gsum").cast("double") / nDocs, 8)
            .cast("decimal(20,8)").as("u"))
        // <= buckets rows: model state, never corpus rows. toRdd, with
        // fields extracted inside the map (shuffle rows are reused
        // buffers).
        .queryExecution.toRdd
        .map(r => (r.getLong(0), r.getDecimal(1, 20, 8).toJavaBigDecimal))
        .collect()
      w = upd.map { case (b, u) =>
        b -> w.getOrElse(b, JBigDecimal.ZERO).subtract(u)
      }.toMap
    }
    feat.unpersist(); lab.unpersist()
    weightsFrame(spark, w)
  }

  /** Score documents under a trained weight table: (doc_id, score,
    * predicted). One map pass + one groupBy against the broadcast
    * weights — the 100 TB filtering pass. (Empty/whitespace docs stay
    * in the output: the all-positions bigram kernel's shorter-than-2
    * edge gives them a single '' gram, so they score like any other
    * document — sigmoid of that bucket's weight.)
    *
    * For a shuffle-free alternative see [[scoreInline]]. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int): DataFrame =
    docScores(DataMix.docBuckets(docs, idCol, textCol, buckets), weights)
      .select(col("doc_id"),
        col("p").cast("double").as("score"),
        (col("p") >= 0.5).as("predicted"))

  /** Collect a weight table into the referenced-object model the
    * map-tier scoring kernel consumes — <= `buckets` rows of model
    * state (the CentroidMatrix rule), stored as exact scaled longs. */
  def weightsModel(weights: DataFrame,
      buckets: Int): graft.functions.expr.ClassifierWeights = {
    val w = new Array[Long](buckets)
    // toRdd bookkeeping collect (NOTES finding #21); <= buckets rows.
    weights.select(col("b"), col("w").cast("decimal(20,8)"))
      .queryExecution.toRdd
      .map(r => (r.getLong(0),
        r.getDecimal(1, 20, 8).toJavaBigDecimal
          .setScale(8).unscaledValue().longValueExact()))
      .collect().foreach { case (b, uw) => w(b.toInt) = uw }
    new graft.functions.expr.ClassifierWeights(buckets, w)
  }

  /** The classifier score as a pure map-tier COLUMN over a token
    * array — no explode, no join, no shuffle; spec-pinned bit-equal
    * to the relational [[score]] path. This is what the stateless
    * streaming curation chain and inline gates use. */
  def scoreCol(toks: Column,
      model: graft.functions.expr.ClassifierWeights): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.ClassifierScore(
      ColumnBridge.expression(toks), model))
  }

  /** Shuffle-free twin of [[score]] under a collected model: one
    * codegen map pass — the shape for scoring inside a larger
    * per-row pipeline (or a stream). */
  def scoreInline(docs: DataFrame, idCol: String, textCol: String,
      model: graft.functions.expr.ClassifierWeights): DataFrame = {
    import graft.functions.TextFunctions.tokens
    docs.select(col(idCol).as("doc_id"),
        scoreCol(tokens(col(textCol)), model).as("score"))
      .withColumn("predicted", col("score") >= 0.5)
  }
}
