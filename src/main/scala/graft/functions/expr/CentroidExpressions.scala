package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Centroid matrix carried by the k-means expressions as ONE referenced
  * object instead of k `typedLit` array literals (the VERDICT r03
  * scale-killer: k embedded literals make plan size and generated code
  * O(k*dim), hitting codegen method limits and plan-string OOMs at the
  * realistic-IVF k >= 1024 long before data volume matters). As a
  * reference object it ships with the broadcast task binary once per
  * stage, the plan string stays O(1), and the distance loop is a plain
  * JIT-compiled array walk.
  *
  * `cc(j)` is the left-to-right sum of squares of centroid j — the same
  * accumulation order as the driver-side `c.map(x => x*x).sum` it
  * replaces and as the DuckDB oracle's `list_sum([w[i]*w[i] ...])`.
  */
final class CentroidMatrix(
    val k: Int, val dim: Int, val flat: Array[Double], val cc: Array[Double])
    extends Serializable {

  override def equals(other: Any): Boolean = other match {
    case m: CentroidMatrix =>
      k == m.k && dim == m.dim &&
        java.util.Arrays.equals(flat, m.flat) && java.util.Arrays.equals(cc, m.cc)
    case _ => false
  }

  override def hashCode(): Int =
    31 * (31 * k + dim) + java.util.Arrays.hashCode(flat)

  override def toString: String = s"CentroidMatrix(k=$k, dim=$dim)"
}

object CentroidMatrix {
  def apply(cen: Seq[Array[Double]]): CentroidMatrix = {
    require(cen.nonEmpty, "centroid matrix must have k >= 1")
    val k = cen.length
    val dim = cen.head.length
    val flat = new Array[Double](k * dim)
    val cc = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = cen(j)
      require(c.length == dim, s"centroid $j has dim ${c.length}, expected $dim")
      System.arraycopy(c, 0, flat, j * dim, dim)
      var s = 0.0
      var i = 0
      while (i < dim) { s += c(i) * c(i); i += 1 }
      cc(j) = s
      j += 1
    }
    new CentroidMatrix(k, dim, flat, cc)
  }
}

/** Shared per-row kernel: squared-L2 distances to every centroid, each
  * rounded to 6dp (the cross-engine determinism boundary), computed as
  * `round((x.x - 2*x.c_j) + c_j.c_j, 6)` — term order and accumulation
  * order bit-identical to the previous column formula
  * (`round(xx - lit(2) * dot(emb, typedLit(c)) + lit(cc), 6)`) and to
  * the DuckDB oracle's
  * `round(x.xx - 2*list_sum([...]) + list_sum([w*w]), 6)`.
  *
  * Called once per row from generated code (O(1) code size regardless
  * of k); the inner loops are JIT-compiled primitive array walks, so
  * there is no interpretation overhead despite not inlining the loop
  * into the generated source.
  */
object CentroidKernel {

  /** Spark's `round(double, 6)` semantics (RoundBase): NaN/Inf pass
    * through, otherwise HALF_UP on the shortest-decimal BigDecimal. */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Rounded distances to all k centroids; null on dim mismatch or a
    * null element (the [[FloatDotProduct]] null contract). */
  def distances(x: ArrayData, isDouble: Boolean, m: CentroidMatrix): ArrayData = {
    val d = raw(x, isDouble, m)
    if (d == null) null else new GenericArrayData(d)
  }

  /** Lowest-index argmin of the rounded distances (the
    * `list_indexof(l, list_min(l)) - 1` rule); -1 signals null input
    * conditions to the codegen caller. */
  def nearest(x: ArrayData, isDouble: Boolean, m: CentroidMatrix): Int = {
    val d = raw(x, isDouble, m)
    if (d == null) return -1
    var best = 0
    var bestV = d(0)
    var j = 1
    while (j < m.k) {
      if (d(j) < bestV) { best = j; bestV = d(j) }
      j += 1
    }
    best
  }

  private def raw(x: ArrayData, isDouble: Boolean, m: CentroidMatrix): Array[Double] = {
    val dim = m.dim
    if (x.numElements() != dim) return null
    // Widen the row once: one pass instead of k re-reads of ArrayData.
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      v(i) = if (isDouble) x.getDouble(i) else x.getFloat(i).toDouble
      i += 1
    }
    var xx = 0.0
    i = 0
    while (i < dim) { xx += v(i) * v(i); i += 1 }
    val out = new Array[Double](m.k)
    var j = 0
    while (j < m.k) {
      val off = j * dim
      var dot = 0.0
      i = 0
      while (i < dim) { dot += v(i) * m.flat(off + i); i += 1 }
      out(j) = round6((xx - 2.0 * dot) + m.cc(j))
      j += 1
    }
    out
  }
}

private[expr] trait CentroidExpression extends UnaryExpression {
  def matrix: CentroidMatrix

  /** Null can arise from non-null input (dim mismatch, null element) —
    * same rationale as [[FloatDotProduct.nullable]]. */
  override def nullable: Boolean = true

  protected def isDoubleChild: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<float|double>, got $t")
    }
}

/** `array<double>` of k rounded squared-L2 distances to the matrix
  * centroids — the probe-ranking input on the (small) query side. */
case class CentroidDistances(child: Expression, matrix: CentroidMatrix)
    extends CentroidExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CentroidKernel.distances(input.asInstanceOf[ArrayData], isDoubleChild, matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidMatrix", matrix,
      classOf[CentroidMatrix].getName)
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = graft.functions.expr.CentroidKernel.distances($x, $isDoubleChild, $m);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidDistances =
    copy(child = newChild)

  override def prettyName: String = "centroid_distances"
}

/** Nearest-centroid index (int) under the rounded-distance,
  * lowest-index-tie rule — the cluster-assignment hot path run over
  * every corpus row. */
case class NearestCentroidId(child: Expression, matrix: CentroidMatrix)
    extends CentroidExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val r = CentroidKernel.nearest(input.asInstanceOf[ArrayData], isDoubleChild, matrix)
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidMatrix", matrix,
      classOf[CentroidMatrix].getName)
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = graft.functions.expr.CentroidKernel.nearest($x, $isDoubleChild, $m);
         |if (${ev.value} < 0) ${ev.isNull} = true;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidId =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}
