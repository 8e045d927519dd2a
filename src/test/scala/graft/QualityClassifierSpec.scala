package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

/** Specs for the fastText-style logistic quality filter. */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Linearly separable corpora: two disjoint vocabularies.
  private val pos = (0L until 30L).map(i =>
    (i, "the quick brown fox jumps over the lazy dog again", 1))
  private val neg = (30L until 60L).map(i =>
    (i, "zx qv wm kj pq rs tu vw xy zn", 0))

  test("classifier separates disjoint vocabularies and is deterministic") {
    val labeled = (pos ++ neg).toDF("doc_id", "text", "y")
    def run() = {
      val w = QualityClassifier.train(labeled, "doc_id", "text", "y",
        buckets = 128, iters = 3, lr = 0.5)
      QualityClassifier.score(labeled, "doc_id", "text", w, buckets = 128)
        .select("doc_id", "score", "predicted")
        .as[(Long, Double, Boolean)].collect().toSeq.sortBy(_._1)
    }
    val out = run()
    assert(out.size == 60)
    val (p, n) = out.partition(_._1 < 30L)
    assert(p.map(_._2).min > n.map(_._2).max,
      "every positive outscores every negative")
    assert(p.forall(_._3) && n.forall(!_._3),
      "0.5 threshold separates the vocabularies after 3 iterations")
    assert(run() == out, "training + scoring is bit-deterministic")
  }

  test("untrained (empty) weights score exactly 0.5 everywhere") {
    val docs = pos.take(5).toDF("doc_id", "text", "y")
    val w0 = QualityClassifier.train(docs, "doc_id", "text", "y",
      buckets = 64, iters = 1, lr = 0.0) // lr 0 => weights stay zero
    val out = QualityClassifier.score(docs, "doc_id", "text", w0, buckets = 64)
      .select("score").as[Double].collect()
    assert(out.forall(_ == 0.5))
  }

  test("inline kernel scoring is bit-equal to the relational path, incl. edge docs") {
    val labeled = (pos ++ neg).toDF("doc_id", "text", "y")
    val w = QualityClassifier.train(labeled, "doc_id", "text", "y",
      buckets = 128, iters = 3, lr = 0.5)
    val model = QualityClassifier.weightsModel(w, buckets = 128)
    // Mixed shapes: normal docs, a single-token doc (the whole-join
    // bigram edge), an empty and a whitespace doc (the '' gram).
    val docs = (pos.take(3).map(t => (t._1, t._2)) ++
      neg.take(3).map(t => (t._1, t._2)) ++
      Seq((100L, "the"), (101L, ""), (102L, "   ")))
      .toDF("doc_id", "text")
    val rel = QualityClassifier.score(docs, "doc_id", "text", w, buckets = 128)
      .select("doc_id", "score", "predicted")
      .as[(Long, Double, Boolean)].collect().toSeq.sortBy(_._1)
    val inl = QualityClassifier.scoreInline(docs, "doc_id", "text", model)
      .select("doc_id", "score", "predicted")
      .as[(Long, Double, Boolean)].collect().toSeq.sortBy(_._1)
    assert(inl == rel, "kernel path must be bit-equal to the relational path")
    assert(rel.map(_._1).contains(101L),
      "empty docs score through the '' gram on both paths")
    // Interpreted evaluation agrees with the codegen path.
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.functions.TextFunctions.tokens
    import org.apache.spark.sql.catalyst.expressions.Literal
    val expr = graft.functions.expr.ClassifierScore(
      Literal.create(Seq("the", "quick"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)), model)
    val interpreted = expr.eval(null).asInstanceOf[Double]
    val viaDf = Seq((1L, "the quick")).toDF("doc_id", "text")
    val codegen = QualityClassifier.scoreInline(viaDf, "doc_id", "text", model)
      .select("score").as[Double].collect().head
    assert(interpreted == codegen)
  }

  test("weight table is bounded by the bucket count and typed decimal(20,8)") {
    val labeled = (pos ++ neg).toDF("doc_id", "text", "y")
    val w = QualityClassifier.train(labeled, "doc_id", "text", "y",
      buckets = 32, iters = 2, lr = 0.5)
    assert(w.count() <= 32)
    assert(w.schema("w").dataType ==
      org.apache.spark.sql.types.DecimalType(20, 8))
    // Mixed-sign weights: positive-vocabulary buckets drift up,
    // negative-vocabulary buckets drift down.
    val vals = w.select(col("w").cast("double")).as[Double].collect()
    assert(vals.exists(_ > 0) && vals.exists(_ < 0))
  }
}
