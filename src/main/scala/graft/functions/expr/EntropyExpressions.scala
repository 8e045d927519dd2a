package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon character-entropy kernel (bits per character) — the
  * gibberish / encoded-blob / repetitive-filler detector quality
  * pipelines run beside the Gopher rules (low entropy = repeated
  * filler, very high = base64/binary spill; natural language sits in
  * a band).
  *
  * Engine-exact discipline: per distinct codepoint the term
  * `round8(-(p * (ln p / ln 2)))` (the q57 8dp-ln rule, identical
  * expression tree in the DuckDB oracle), terms summed EXACTLY as
  * 1e8-scaled longs (order-invariant, mirrors the oracle's DECIMAL
  * sum), final 6dp round. One pass over the string + a
  * distinct-codepoint loop; no allocation beyond the histogram.
  *
  * Unit of count: Unicode CODE POINTS (`codePointAt`, surrogate pairs
  * = one symbol; combining marks count separately) — the intended
  * engine semantics (entropy over grapheme clusters would under-count
  * a base64-style spill that happens to carry diacritics). The q127
  * DuckDB oracle matches EXACTLY, non-BMP included (VERDICT r07 item
  * 8): it splits with `regexp_extract_all(text, '[\s\S]')` — RE2
  * consumes one code point per match — rather than
  * `string_split(text, '')`, whose grapheme clusters diverge from
  * code points on combining sequences. Pinned on an emoji+combining
  * fixture in TextOpsSpec (hand-computed entropies) and validated
  * against DuckDB on the same fixture. */
object EntropyKernel {

  private val LN2 = Math.log(2.0)

  /** Entropy of the codepoint distribution; NaN-free by construction,
    * caller must not pass an empty string (the expression layer maps
    * empty to null). */
  def entropy(text: UTF8String): Double = {
    val s = text.toString
    val hist = new java.util.HashMap[Integer, java.lang.Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1L
      hist.merge(cp, java.lang.Long.valueOf(1L),
        (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
    }
    val nd = n.toDouble
    var acc = 0L // exact sum of the 1e8-scaled 8dp-rounded terms
    val it = hist.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      val p = c / nd
      val t = -(p * (Math.log(p) / LN2))
      acc += BigDecimal(t).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        .underlying.unscaledValue().longValueExact()
    }
    // Round the exact 8dp DECIMAL sum to 6dp IN INTEGER SPACE, then
    // convert — rounding the double instead flips exact X.5e-6 sums
    // (hit 4 times at sf0.01: the binary double sits just under the
    // half). Half-up == half-away for the non-negative entropy; the
    // 6dp integer converts to double correctly-rounded, matching the
    // oracle's CAST(round(DECIMAL, 6) AS DOUBLE).
    ((acc + 50L) / 100L).toDouble / 1e6
  }
}

/** Native `char_entropy(text)`: [[EntropyKernel.entropy]] as a
  * codegen'd scalar; empty strings yield null (the ANSI-guard
  * convention for undefined per-document ratios). */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects string, got $other")
  }

  override def nullSafeEval(text: Any): Any = {
    val t = text.asInstanceOf[UTF8String]
    if (t.numChars() == 0) null else EntropyKernel.entropy(t)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numChars() == 0) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.expr.EntropyKernel.entropy($c);
      }""")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}
