package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time BPE segmentation kernel, called from generated code.
  *
  * The merge TABLE rides into codegen as ONE reference object (the
  * [[CentroidExpressions]] discipline): the physical plan is O(1) in
  * the number of learned merges, so an 8k-merge tokenizer costs the
  * same plan as a 3-merge one — re-deriving each training round's
  * symbol state from the base word table is a constant-shape map pass,
  * never a per-round lineage chain of `replace` calls (which would
  * rebuild r03's k-means plan-size ceiling, one nested call per merge).
  */
object BpeOps {

  /** Split `token` into code-point symbols, then apply `merges`
    * (flattened [a0,b0,a1,b1,...], creation order) sequentially; each
    * merge rewrites the symbol sequence left-to-right, non-overlapping
    * — exactly the training evolution, so replaying the merge list
    * reproduces the trainer's state (the standard BPE property, cf.
    * Sennrich et al. 2016's public reference implementation). A
    * presence set lets merges whose parts cannot occur skip the scan
    * (false positives from consumed symbols only cost a wasted scan). */
  def applyMerges(token: UTF8String, merges: Array[String]): ArrayData = {
    val s = token.toString
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cc = Character.charCount(s.codePointAt(i))
      syms.add(s.substring(i, i + cc))
      i += cc
    }
    val present = new java.util.HashSet[String](syms)
    var m = 0
    while (m < merges.length) {
      val a = merges(m); val b = merges(m + 1)
      if (present.contains(a) && present.contains(b) && syms.size >= 2) {
        var merged = false
        val out = new java.util.ArrayList[String](syms.size)
        var j = 0
        while (j < syms.size) {
          if (j + 1 < syms.size && syms.get(j) == a && syms.get(j + 1) == b) {
            out.add(a + b); merged = true; j += 2
          } else { out.add(syms.get(j)); j += 1 }
        }
        if (merged) { syms = out; present.add(a + b) }
      }
      m += 2
    }
    val arr = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { arr(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new GenericArrayData(arr)
  }
}

/** Native `bpe_apply_merges(token)`: the symbol sequence of a token
  * after replaying a learned merge list. See [[BpeOps.applyMerges]]. */
case class BpeApplyMerges(child: Expression, merges: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects string, got $other")
  }

  // Flattened [a0,b0,a1,b1,...] — each merge is its "a b" pair string.
  private lazy val flat: Array[String] = merges.iterator.flatMap { p =>
    val i = p.indexOf(' ')
    require(i > 0, s"merge pair must be 'a b', got '$p'")
    Iterator(p.substring(0, i), p.substring(i + 1))
  }.toArray

  override def nullSafeEval(token: Any): Any =
    BpeOps.applyMerges(token.asInstanceOf[UTF8String], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.BpeOps.applyMerges($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyMerges =
    copy(child = newChild)

  override def prettyName: String = "bpe_apply_merges"
}
