package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Gopher rule measurements (Rae et al. 2021 A1.1) — the
  * kernel form of [[graft.operators.TextAnalysis.gopherRules]]'s
  * measure columns. The declarative form pays FIVE interpreted
  * higher-order-function lambdas per document (aggregate for word
  * lengths, filter for bullets/ellipses/alpha/stopwords — finding #1:
  * HOF lambdas are CodegenFallback); this kernel walks the document
  * bytes once for the text-level counts and the token array once for
  * the word-level counts, bit-identical to the declarative columns
  * (and therefore to the DuckDB oracle that mirrors them):
  *
  *  - words = whitespace-split tokens (the caller passes the SAME
  *    `tokens(text)` array the declarative form uses);
  *  - word length = character count (UTF-8 continuation bytes are not
  *    counted);
  *  - '...' occurrences are non-overlapping left-to-right (the
  *    regexp_replace contract);
  *  - lines = split on '\n' KEEPING empties (Spark split keeps
  *    trailing empty strings), a bullet line starts with -, *, or •
  *    after trimming ASCII spaces (UTF8String.trim), an ellipsis line
  *    ends with "...";
  *  - per-word ratios are null when the document has no words (the
  *    ANSI zero-divisor guard);
  *  - every ratio is rounded with Spark `round(_, 6)` semantics
  *    ([[CentroidKernel.round6]]).
  */
object GopherKernel {

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = true),
    StructField("symbol_ratio", DoubleType, nullable = true),
    StructField("bullet_ratio", DoubleType, nullable = false),
    StructField("ellipsis_ratio", DoubleType, nullable = false),
    StructField("alpha_ratio", DoubleType, nullable = true),
    StructField("stopword_hits", IntegerType, nullable = false)))

  private def isCont(b: Byte): Boolean = (b & 0xc0) == 0x80

  def measure(text: UTF8String, toks: org.apache.spark.sql.catalyst.util.ArrayData,
      stopwords: Array[UTF8String]): InternalRow = {
    // ---- token-array pass: n_words, char lengths, alpha words ----
    val nw = toks.numElements()
    var lenSum = 0L
    var alpha = 0
    var i = 0
    while (i < nw) {
      val w = toks.getUTF8String(i)
      lenSum += w.numChars()
      val b = w.getBytes
      var j = 0
      var hasAlpha = false
      while (j < b.length && !hasAlpha) {
        val c = b(j)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
        j += 1
      }
      if (hasAlpha) alpha += 1
      i += 1
    }
    // distinct stopword membership (8-entry list, linear scans)
    var stopHits = 0
    var s = 0
    while (s < stopwords.length) {
      var found = false
      i = 0
      while (i < nw && !found) {
        if (toks.getUTF8String(i).equals(stopwords(s))) found = true
        i += 1
      }
      if (found) stopHits += 1
      s += 1
    }
    // ---- byte pass over the raw text: '#', '...', lines ----
    val bytes = text.getBytes
    val n = bytes.length
    var hashes = 0
    var ellipses = 0
    var nl = 1
    var bulletLines = 0
    var ellipsisLines = 0
    var lineStart = 0
    def closeLine(lineEnd: Int): Unit = {
      // trim ASCII spaces (the UTF8String.trim contract)
      var a = lineStart
      var z = lineEnd
      while (a < z && bytes(a) == ' ') a += 1
      while (z > a && bytes(z - 1) == ' ') z -= 1
      if (a < z) {
        val c = bytes(a)
        if (c == '-' || c == '*' ||
          // '•' U+2022 = e2 80 a2
          (c == 0xe2.toByte && a + 2 < z &&
            bytes(a + 1) == 0x80.toByte && bytes(a + 2) == 0xa2.toByte))
          bulletLines += 1
      }
      // ellipsis-end checks the UNTRIMMED line (the declarative
      // rlike("\\.\\.\\.$") runs on the raw line)
      if (lineEnd - lineStart >= 3 && bytes(lineEnd - 1) == '.' &&
        bytes(lineEnd - 2) == '.' && bytes(lineEnd - 3) == '.')
        ellipsisLines += 1
    }
    i = 0
    while (i < n) {
      val b = bytes(i)
      if (b == '#') { hashes += 1; i += 1 }
      else if (b == '.' && i + 2 < n && bytes(i + 1) == '.' && bytes(i + 2) == '.') {
        ellipses += 1; i += 3 // non-overlapping left-to-right
      } else if (b == '\n') {
        closeLine(i); nl += 1; lineStart = i + 1; i += 1
      } else i += 1
    }
    closeLine(n)

    val out = new GenericInternalRow(7)
    out.setInt(0, nw)
    if (nw == 0) { out.setNullAt(1); out.setNullAt(2); out.setNullAt(5) }
    else {
      out.setDouble(1, CentroidKernel.round6(lenSum.toDouble / nw))
      // = round((hashes + (3*ellipses)/3.0) / nw, 6): the declarative
      // (len - len(replace))/3 is exactly the occurrence count.
      out.setDouble(2, CentroidKernel.round6((hashes + ellipses).toDouble / nw))
      out.setDouble(5, CentroidKernel.round6(alpha.toDouble / nw))
    }
    out.setDouble(3, CentroidKernel.round6(bulletLines.toDouble / nl))
    out.setDouble(4, CentroidKernel.round6(ellipsisLines.toDouble / nl))
    out.setInt(6, stopHits)
    out
  }
}

/** `gopher_measures(text, tokens)`: the struct of Gopher rule
  * measurements in one codegen call per row. The caller extracts
  * fields in a PROJECTION (codegen CSE evaluates the kernel once);
  * filtering directly on an extracted field would re-evaluate per
  * branch under predicate pushdown (finding #11) — gate on the
  * materialized columns instead. */
case class GopherMeasures(left: Expression, right: Expression,
    stopwords: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  @transient private lazy val stopArr: Array[UTF8String] =
    stopwords.map(UTF8String.fromString).toArray

  override def dataType: DataType = GopherKernel.schema
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"expects (string, array<string>), got ($a, $b)")
    }

  override def nullSafeEval(t: Any, tk: Any): Any =
    GopherKernel.measure(t.asInstanceOf[UTF8String],
      tk.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], stopArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sw = ctx.addReferenceObj("gopherStopwords", stopArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, (t, tk) =>
      s"${ev.value} = graft.functions.expr.GopherKernel.measure($t, $tk, $sw);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GopherMeasures =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "gopher_measures"
}
