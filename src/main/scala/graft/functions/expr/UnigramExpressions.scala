package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained unigram-LM tokenizer model as ONE referenced object (the
  * [[ClassifierWeights]] pattern): piece → probability, where every
  * probability is `(count+1)/(total+|V|)` computed as ONE IEEE double
  * division — +, *, / are correctly-rounded IEEE operations, so the
  * probabilities and every Viterbi path product are BIT-IDENTICAL
  * across engines (unlike ln/exp/pow, which vary by libm; this is why
  * the whole trainer works in probability space, never log space).
  *
  * `pieces`/`probs` are parallel arrays sorted by piece (structural
  * equality and a deterministic iteration order); the probe map is
  * rebuilt lazily after deserialization. `unkProb` = `1/(total+|V|)`
  * — the add-one floor a single character NOT in the vocabulary
  * scores at, which keeps every word segmentable.
  */
final class UnigramModel(val maxPieceLen: Int, val pieces: Array[String],
    val probs: Array[Double], val unkProb: Double) extends Serializable {
  require(pieces.length == probs.length,
    s"pieces ${pieces.length} != probs ${probs.length}")

  @transient lazy val probOf: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), probs(i)); i += 1 }
    m
  }

  override def equals(other: Any): Boolean = other match {
    case m: UnigramModel =>
      maxPieceLen == m.maxPieceLen && unkProb == m.unkProb &&
        java.util.Arrays.equals(pieces.asInstanceOf[Array[AnyRef]],
          m.pieces.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(probs, m.probs)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * maxPieceLen + java.util.Arrays.hashCode(
      pieces.asInstanceOf[Array[AnyRef]])) + java.util.Arrays.hashCode(probs)
  override def toString: String = s"UnigramModel(|V|=${pieces.length})"
}

/** Viterbi segmentation + scoring kernels, called from generated code.
  * DP over CODE POINTS (SQL `substr` character semantics):
  * `dp[0] = 1.0; dp[i] = max over j in [i-maxPieceLen, i-1] of
  * dp[j] * p(word[j..i])`, candidates in ascending j, accepted only on
  * STRICT improvement — so the smallest j (longest last piece) wins
  * ties, exactly the oracle's `>=`-chain tie-break. A missing
  * single-char piece scores `unkProb`; a missing longer piece is no
  * candidate. Products compose left-to-right along the backpointer
  * chain — the same canonical order on both engines, hence the same
  * bits. */
object UnigramKernel {

  private def codePoints(w: String): Array[String] = {
    val b = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < w.length) {
      val cc = Character.charCount(w.codePointAt(i))
      b += w.substring(i, i + cc)
      i += cc
    }
    b.toArray
  }

  def segment(word: UTF8String, m: UnigramModel): ArrayData = {
    val cps = codePoints(word.toString)
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val dp = new Array[Double](n + 1)
    val bp = new Array[Int](n + 1)
    dp(0) = 1.0
    java.util.Arrays.fill(dp, 1, n + 1, Double.NegativeInfinity)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - m.maxPieceLen)
      while (j < i) {
        if (dp(j) > Double.NegativeInfinity) {
          val piece = cps.slice(j, i).mkString
          val p = m.probOf.get(piece)
          val prob: Double =
            if (p != null) p.doubleValue()
            else if (i - j == 1) m.unkProb
            else -1.0
          if (prob >= 0.0) {
            val cand = dp(j) * prob
            if (cand > dp(i)) { dp(i) = cand; bp(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    // Backtrace right-to-left, then reverse into reading order.
    val rev = scala.collection.mutable.ArrayBuffer[UTF8String]()
    var at = n
    while (at > 0) {
      val j = bp(at)
      rev += UTF8String.fromString(cps.slice(j, at).mkString)
      at = j
    }
    new GenericArrayData(rev.reverse.toArray[Any])
  }

  /** Left-fold product of the pieces' probabilities — identical bits
    * to the DP value the segmentation was chosen by. */
  def score(pieces: ArrayData, m: UnigramModel): Double = {
    var s = 1.0
    var i = 0
    val n = pieces.numElements()
    while (i < n) {
      val piece = pieces.getUTF8String(i).toString
      val p = m.probOf.get(piece)
      s *= (if (p != null) p.doubleValue() else m.unkProb)
      i += 1
    }
    s
  }
}

/** `unigram_segment(word)`: the Viterbi-best piece sequence of a word
  * under a referenced [[UnigramModel]] — segmentation as a pure
  * map-tier column. */
case class UnigramSegment(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects string, got $other")
  }

  override def nullSafeEval(w: Any): Any =
    UnigramKernel.segment(w.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.UnigramKernel.segment($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)

  override def prettyName: String = "unigram_segment"
}

/** `unigram_piece_score(pieces)`: the left-fold probability product of
  * a piece array under a referenced [[UnigramModel]] — equals the
  * Viterbi DP value for kernel-produced segmentations. */
case class UnigramPieceScore(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects array<string>, got $other")
  }

  override def nullSafeEval(ps: Any): Any =
    UnigramKernel.score(ps.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.UnigramKernel.score($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramPieceScore =
    copy(child = newChild)

  override def prettyName: String = "unigram_piece_score"
}
