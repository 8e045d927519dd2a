package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{BpeTrainer, UnigramTrainer}
import graft.functions.expr.UnigramKernel

/** Specs for the deterministic Viterbi-EM unigram-LM tokenizer:
  * round-trip segmentation, preference for frequent multi-char pieces,
  * exact DP-score consistency, unknown-character floor, determinism,
  * and interpreted-path parity with the codegen kernel. */
class UnigramTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("segmentations concatenate back to their words; scores are the DP product") {
    val wf = BpeTrainer.wordFrequencies(
      corpus("abcd abcd abcd ab cd xyz abcdxy", "abcd ab ab cd q"), "text")
    val (model, counts) = UnigramTrainer.train(wf)
    val seg = UnigramTrainer.segment(wf, model)
      .select("word", "segmentation", "n_pieces", "score")
      .as[(String, String, Int, Double)].collect()
    assert(seg.nonEmpty)
    seg.foreach { case (w, s, n, sc) =>
      assert(s.replace(" ", "") == w, s"round-trip failed: '$s' vs '$w'")
      assert(n == s.split(' ').length)
      val manual = s.split(' ').foldLeft(1.0)((acc, p) =>
        acc * model.probOf.get(p).doubleValue())
      assert(sc == manual, s"score must be the exact left-fold product for $w")
    }
    // 'abcd' occurs often -> it is a seed piece and EM keeps it whole.
    val abcd = seg.find(_._1 == "abcd").get
    assert(abcd._3 == 1, s"frequent word should stay one piece: $abcd")
    // vocabulary artifact: counts for every piece, probs normalize to
    // (T+V)/(T+V) = 1 with the +1 smoothing folded in.
    val t = counts.map(_._2).sum.toDouble
    val v = counts.length
    val probSum = counts.map { case (_, c) => (c + 1).toDouble / (t + v) }.sum
    assert(math.abs(probSum - 1.0) < 1e-12)
  }

  test("training is deterministic run-to-run") {
    val wf = BpeTrainer.wordFrequencies(
      corpus("seven silver swans swim slowly seven swans", "swim swam swum"), "text")
    val (m1, c1) = UnigramTrainer.train(wf)
    val (m2, c2) = UnigramTrainer.train(wf)
    assert(m1 == m2 && c1.toSeq == c2.toSeq)
  }

  test("unknown characters segment via the unk floor, never crash") {
    val wf = BpeTrainer.wordFrequencies(corpus("aa bb aa"), "text")
    val (model, _) = UnigramTrainer.train(wf)
    val out = UnigramTrainer.segment(
      Seq(("zq", 1L)).toDF("token", "freq"), model)
      .select("segmentation", "score").as[(String, Double)].head()
    assert(out._1 == "z q")
    assert(out._2 == model.unkProb * model.unkProb)
  }

  test("word-frequency state is additive: slice-composed training == from-scratch") {
    // The weekly cadence for tokenizer state: each batch writes only
    // its word-count slice; training reads union + re-sum. Pinned for
    // BOTH tokenizer families (they share the frequency frame).
    val batchA = corpus("abcd abcd ab xyz", "abcd cd cd")
    val batchB = corpus("abcd ab ab q xyz xyz")
    val scratch = BpeTrainer.wordFrequencies(
      batchA.unionByName(batchB.select(col("doc_id") + 100, col("text"))
        .toDF("doc_id", "text")), "text")
    val composed = BpeTrainer.wordFrequencies(batchA, "text")
      .unionByName(BpeTrainer.wordFrequencies(batchB, "text"))
      .groupBy("token").agg(sum("freq").as("freq"))
    val (mS, cS) = UnigramTrainer.train(scratch)
    val (mC, cC) = UnigramTrainer.train(composed)
    assert(mS == mC && cS.toSeq == cC.toSeq,
      "unigram training must be invariant to slice composition")
    assert(BpeTrainer.train(scratch, maxMerges = 3, minCount = 1L) ==
      BpeTrainer.train(composed, maxMerges = 3, minCount = 1L),
      "BPE training must be invariant to slice composition")
  }

  test("interpreted eval matches the codegen kernel") {
    val wf = BpeTrainer.wordFrequencies(corpus("abab abab ab ba baba"), "text")
    val (model, _) = UnigramTrainer.train(wf)
    val words = Seq("abab", "baba", "ab", "bbbb", "a")
    def segmentAll(): Map[String, String] = UnigramTrainer.segment(
      words.map((_, 1L)).toDF("token", "freq"), model)
      .select("word", "segmentation").as[(String, String)].collect().toMap
    val viaDf = segmentAll() // compiled arm (strict CODEGEN_ONLY session)
    assert(TestSpark.interpreted(segmentAll()) == viaDf,
      "NO_CODEGEN factories must produce the same segmentations")
    words.foreach { w =>
      val arr = UnigramKernel.segment(UTF8String.fromString(w), model)
      val pieces = (0 until arr.numElements())
        .map(i => arr.getUTF8String(i).toString).mkString(" ")
      assert(pieces == viaDf(w), s"path divergence for $w")
    }
  }
}
