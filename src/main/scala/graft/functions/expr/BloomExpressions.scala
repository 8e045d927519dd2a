package graft.functions.expr

import java.io.OutputStream
import java.security.{DigestOutputStream, MessageDigest}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** A built Bloom filter as ONE referenced object (the
  * [[ClassifierWeights]] pattern): the approximate-membership sketch a
  * 100 TB incremental-dedup pass broadcasts instead of shuffling its
  * full historical key set. ~1.44·log2(1/fpp) bits per key (Bloom
  * 1970), so a billion-key history at 1% fpp is ~1.2 GB — executor-
  * broadcastable where the exact key set is not.
  *
  * Structural equality (required for plan equality / codegen caching)
  * compares bitSize plus an md5 of the serialized filter, computed
  * lazily once per instance — one streaming pass, no second copy of
  * the bit array.
  */
final class BloomRef(val bf: BloomFilter) extends Serializable {

  @transient private lazy val digest: String = {
    val md = MessageDigest.getInstance("MD5")
    val sink = new DigestOutputStream(OutputStream.nullOutputStream(), md)
    bf.writeTo(sink)
    sink.flush()
    md.digest().map("%02x".format(_)).mkString
  }

  override def equals(other: Any): Boolean = other match {
    case r: BloomRef => bf.bitSize() == r.bf.bitSize() && digest == r.digest
    case _ => false
  }
  override def hashCode(): Int = digest.hashCode
  override def toString: String = s"BloomRef(bits=${bf.bitSize()})"
}

/** Row-side Bloom probe, called from generated code. */
object BloomKernel {
  def contains(r: BloomRef, h: Long): Boolean = r.bf.mightContainLong(h)
}

/** `bloom_might_contain(h64)`: approximate membership of a 64-bit key
  * in a referenced [[BloomRef]] — false is DEFINITE non-membership
  * (no false negatives), true needs exact confirmation at rate fpp.
  * A pure map-tier predicate: the gate that lets an incremental batch
  * skip the shuffle join against corpus history for the (vast) mass
  * of genuinely-new keys. */
case class BloomMightContain(child: Expression, bloom: BloomRef)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects bigint, got $other")
  }

  override def nullSafeEval(h: Any): Any =
    BloomKernel.contains(bloom, h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bloomRef", bloom, classOf[BloomRef].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.BloomKernel.contains($m, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
