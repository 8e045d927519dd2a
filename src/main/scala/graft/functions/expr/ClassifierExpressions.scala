package graft.functions.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Trained logistic-regression weights as ONE referenced object (the
  * [[CentroidMatrix]] pattern): a dense scaled-long array indexed by
  * feature bucket — weight w stored as round(w*1e8) exactly (the
  * decimal(20,8) unscaled value), so the per-document margin is an
  * EXACT long sum, order-invariant like the relational decimal sum it
  * mirrors. Missing buckets hold 0 (the coalesce-to-zero left join).
  */
final class ClassifierWeights(val buckets: Int, val w: Array[Long])
    extends Serializable {
  require(w.length == buckets, s"weight array ${w.length} != buckets $buckets")

  override def equals(other: Any): Boolean = other match {
    case m: ClassifierWeights =>
      buckets == m.buckets && java.util.Arrays.equals(w, m.w)
    case _ => false
  }
  override def hashCode(): Int = 31 * buckets + java.util.Arrays.hashCode(w)
  override def toString: String = s"ClassifierWeights(buckets=$buckets)"
}

/** Per-document scoring kernel: the SAME feature walk as
  * [[graft.operators.DataMix.docBuckets]] (unigram instances plus the
  * all-positions word bigrams, incl. the shorter-than-2 whole-join
  * gram — [[ShingleOps.wordNgrams]]'s edge), each gram hashed with the
  * md5-prefix bucket hash (`shingleHash32 % buckets`), margins summed
  * as exact scaled longs, one sigmoid + Spark-semantics 8dp round at
  * the boundary. Bit-equal to the relational
  * explode→join→groupBy scoring path for every document — including
  * empty ones (their single '' gram scores like any other), which the
  * relational path also keeps. Called once per ROW from generated
  * code; the gram loop is a JIT-compiled byte walk. */
object ClassifierKernel {

  private def digestBucket(md: MessageDigest, m: ClassifierWeights): Int = {
    val d = md.digest() // digest() resets the instance
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % m.buckets).toInt
  }

  private def bucketOf(md: MessageDigest, m: ClassifierWeights,
      g: Array[Byte]): Int = {
    md.update(g)
    digestBucket(md, m)
  }

  private def bucketOf2(md: MessageDigest, m: ClassifierWeights,
      a: Array[Byte], b: Array[Byte]): Int = {
    md.update(a); md.update(' '.toByte); md.update(b)
    digestBucket(md, m)
  }

  /** Spark `round(double, 8)` semantics (RoundBase / the
    * [[CentroidKernel.round6]] rationale, at scale 8). */
  def round8(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble

  def score(toks: ArrayData, m: ClassifierWeights): Double = {
    val md = MessageDigest.getInstance("MD5")
    val cnt = toks.numElements()
    var z = 0L
    var i = 0
    while (i < cnt) {
      z += m.w(bucketOf(md, m, toks.getUTF8String(i).getBytes))
      i += 1
    }
    if (cnt >= 2) {
      i = 0
      while (i + 2 <= cnt) {
        z += m.w(bucketOf2(md, m,
          toks.getUTF8String(i).getBytes,
          toks.getUTF8String(i + 1).getBytes))
        i += 1
      }
    } else {
      // wordNgrams' shorter-than-n edge: ONE gram = the whole join
      // ('' for an empty doc, the lone token otherwise).
      val whole =
        if (cnt == 0) Array.emptyByteArray else toks.getUTF8String(0).getBytes
      z += m.w(bucketOf(md, m, whole))
    }
    // Exact decimal -> nearest double (Spark's decimal->double cast),
    // sigmoid, Spark-round to 8dp: the relational path's p column.
    val zD = new java.math.BigDecimal(z).movePointLeft(8).doubleValue()
    round8(1.0 / (1.0 + math.exp(-zD)))
  }
}

/** `classifier_score(tokens)`: the 8dp sigmoid score of a document's
  * token array under referenced [[ClassifierWeights]] — model-based
  * quality filtering as a pure map-tier column (no explode, no join,
  * no shuffle), usable in the stateless streaming curation chain and
  * as the fast batch scoring path. */
case class ClassifierScore(child: Expression, model: ClassifierWeights)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects array<string>, got $other")
  }

  override def nullSafeEval(toks: Any): Any =
    ClassifierKernel.score(toks.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("classifierWeights", model,
      classOf[ClassifierWeights].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.ClassifierKernel.score($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): ClassifierScore =
    copy(child = newChild)

  override def prettyName: String = "classifier_score"
}
