package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` / `array<double>` columns
  * (either element type on either side), with codegen.
  *
  * Why a custom Catalyst Expression (the SURVEY.md §7 "only here is
  * custom Catalyst surface justified" tier): the declarative form —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — runs INTERPRETED
  * (higher-order functions are CodegenFallback) and allocates a zipped
  * array per pair; in pairwise similarity search that expression sits in
  * the innermost loop (|queries| x |corpus| evaluations). This
  * expression compiles to a tight primitive loop inside whole-stage
  * codegen: no allocation, no boxing, no virtual calls.
  *
  * Semantics are IDENTICAL to the declarative form (and the DuckDB
  * oracle): elements widened float->double, products accumulated left
  * to right; null operand, null element, or length mismatch -> null
  * (matching zip_with's null padding + `+`'s null propagation).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Null can arise from non-null inputs (length mismatch, null
    * element), so nullability must not be inherited from the children:
    * with non-nullable inputs BinaryExpression would report
    * nullable=false, the planner would fold `ev.isNull` to the constant
    * `false`, and the generated `false = true;` assignment in
    * [[doGenCode]] would not compile. */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects array<float|double> on both sides, got (${left.dataType}, ${right.dataType})")
  }

  private def elemGetter(t: DataType): (ArrayData, Int) => Double = t match {
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case _ => (a, i) => a.getFloat(i).toDouble
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val getX = elemGetter(left.dataType)
    val getY = elemGetter(right.dataType)
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += getX(x, i) * getY(y, i)
      i += 1
    }
    acc
  }

  private def elemJava(t: DataType, arr: String, i: String): String = t match {
    case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
    case _ => s"((double) $arr.getFloat($i))"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${elemJava(left.dataType, x, i)} * ${elemJava(right.dataType, y, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "float_dot_product"
}
