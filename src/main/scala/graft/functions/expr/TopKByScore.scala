package graft.functions.expr

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, id) pairs under the
  * ranking (score DESC, id ASC). Backed by a TreeSet ordered
  * weakest-first, so insert-and-trim is O(log k) and the k-th element
  * gives an O(1) admission test. */
final class TopKBuffer(val k: Int) {
  // Weakest-first: lowest score first, then HIGHEST id (so the head is
  // always the entry that (score DESC, id ASC) ranks last).
  val set: mutable.TreeSet[(Double, Long)] =
    mutable.TreeSet.empty(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long.reverse))
  def add(score: Double, id: Long): Unit = {
    set.add((score, id))
    if (set.size > k) set.remove(set.head)
  }
}

/** `top_k_by_score(score, id)`: the k best (score, id) pairs per
  * group, ranked (score DESC, id ASC), as a sorted
  * `array<struct<score,id>>`.
  *
  * Why an aggregate and not a window: `row_number().over(partitionBy
  * (query).orderBy(score))` must shuffle and SORT every scored row —
  * for k-NN over a large corpus that is |queries| x |corpus| rows
  * through a sort just to keep k of them. As a TypedImperativeAggregate
  * the plan becomes partial top-k (each map task keeps <= k per query,
  * O(log k) per row, no sort) -> shuffle of k x |queries| rows ->
  * final merge. The output order encodes the rank, so callers
  * `posexplode` to (rank, score, id) without re-sorting.
  *
  * Same determinism contract as the window form: callers must round
  * scores BEFORE aggregating (ties then break on id ASC). */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects (double, bigint), got (${score.dataType}, ${id.dataType})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.set.foreach { case (s, i) => buf.add(s, i) }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.set.toSeq.reverse.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.set.size * 16)
    bb.putInt(buf.set.size)
    buf.set.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(k)
    val n = bb.getInt
    (0 until n).foreach(_ => buf.add(bb.getDouble, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k_by_score"
}
