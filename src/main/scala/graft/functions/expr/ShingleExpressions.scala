package graft.functions.expr

import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time shingling kernels, called from generated code.
  *
  * Why these exist (same tier as [[FloatDotProduct]]): the declarative
  * forms — `transform(sequence(...), i => substr/slice...)` — are
  * higher-order functions, which Catalyst evaluates INTERPRETED
  * (CodegenFallback) with a per-element expression-tree walk and a
  * per-element allocation. For shingling, that per-element work is the
  * entire operator: a document of L characters costs L interpreted
  * `substr` + `md5` evaluations. These kernels do the same loop in
  * plain JVM code, invoked once per row from inside whole-stage
  * codegen.
  */
object ShingleOps {

  /** Min over char-k-gram shingles of the first 64 bits of a salted
    * md5, as 16 lowercase hex chars — semantically identical to
    * `array_min(transform(charShingles(text,k), s => substring(md5(salt:s),1,16)))`:
    * lexicographic min over fixed-width lowercase hex equals unsigned
    * numeric min over the underlying 64-bit value. Documents shorter
    * than k chars contribute the whole text as their single shingle
    * (charShingles' guard). Distinctness is irrelevant under min. */
  /** Char-start byte offsets of a UTF-8 byte array (continuation bytes
    * carry the 10xxxxxx prefix), with a sentinel end offset — the
    * shared boundary scan behind every zero-copy char-slicing kernel
    * ([[minShingleHash]], [[charNgrams]]). Returns an array of
    * numChars + 1 offsets. */
  private def charStarts(bytes: Array[Byte]): Array[Int] = {
    var nChars = 0
    var b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) nChars += 1
      b += 1
    }
    val starts = new Array[Int](nChars + 1)
    var ci = 0
    b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) { starts(ci) = b; ci += 1 }
      b += 1
    }
    starts(nChars) = bytes.length
    starts
  }

  def minShingleHash(text: UTF8String, k: Int, salt: Int): UTF8String = {
    val md = MessageDigest.getInstance("MD5")
    val prefix = (salt.toString + ":").getBytes("UTF-8")
    // Each shingle is a zero-copy slice of the document's byte array —
    // no per-shingle UTF8String/substr allocation on what is an O(len)
    // per-row loop.
    val bytes = text.getBytes
    val starts = charStarts(bytes)
    val nChars = starts.length - 1
    var min = -1L // unsigned max
    var i = 0
    val last = if (nChars >= k) nChars - k else 0
    while (i <= last) {
      val from = starts(i)
      val until = if (nChars >= k) starts(i + k) else bytes.length
      md.update(prefix)
      md.update(bytes, from, until - from)
      val d = md.digest()
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      if (java.lang.Long.compareUnsigned(v, min) < 0) min = v
      i += 1
    }
    UTF8String.fromString(f"$min%016x")
  }

  /** Unicode NFC normalization (canonical composition). Spark has no
    * builtin for this; java.text.Normalizer implements exactly the
    * UAX #15 form DuckDB's `nfc_normalize` implements, so the operator
    * stays oracle-checkable. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  private val Mersenne61 = (1L << 61) - 1

  /** `(a*h + b) mod (2^61-1)` with full 128-bit intermediate
    * precision: `Math.multiplyHigh` supplies the high word, and
    * 2^64 = 8 mod p collapses it with three shifts (the classic
    * Mersenne reduction). Exactly the value DuckDB computes via
    * HUGEINT, at plain-long cost — the DECIMAL(38,0) route through
    * Spark's BigDecimal-backed wide decimals measured 4-7x slower on
    * the MinHash signature aggregate. Inputs must be nonnegative and
    * < p. */
  def permMod61(h: Long, a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, h) // a,h >= 0 -> signed high == unsigned high
    val lo = a * h // wrapped low 64 bits
    var r = (hi << 3) + (lo >>> 61) + (lo & Mersenne61)
    while (r >= Mersenne61) r -= Mersenne61
    r += b
    if (r >= Mersenne61) r -= Mersenne61
    r
  }

  /** Heuristic quality score in one pass: token count, distinct
    * tokens, stopword hits and mean token length feed the four 0.25
    * bands. Arithmetic is bit-identical to the declarative column
    * form (double divisions in the same order; zero-token docs yield
    * NaN ratios whose comparisons are false, score 0.0). See
    * [[QualityScore]]. */
  def qualityScore(toks: ArrayData, nChars: Int,
      stop: java.util.HashSet[UTF8String]): Double = {
    val n = toks.numElements()
    val distinct = new java.util.HashSet[UTF8String](n * 2)
    var nStop = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      distinct.add(t)
      if (stop.contains(t)) nStop += 1
      i += 1
    }
    val nTok = n.toDouble
    val ttr = distinct.size / nTok
    val meanTokLen = (nChars - (nTok - 1)) / nTok
    val stopRatio = nStop / nTok
    (if (n >= 20 && n <= 2000) 0.25 else 0.0) +
      (if (ttr >= 0.3) 0.25 else 0.0) +
      (if (meanTokLen >= 3.0 && meanTokLen <= 10.0) 0.25 else 0.0) +
      (if (stopRatio > 0.0) 0.25 else 0.0)
  }

  /** Argmax label over marker-word occurrence counts: the FIRST label
    * (declared order) whose count equals the maximum, `fallback` when
    * no marker occurs at all. See [[MarkerArgmax]]. */
  def markerArgmax(toks: ArrayData,
      sets: Array[java.util.HashSet[UTF8String]],
      labels: Array[UTF8String], fallback: UTF8String): UTF8String = {
    var best = 0
    var bestIdx = -1
    var s = 0
    while (s < sets.length) {
      val c = countInSet(toks, sets(s))
      if (c > best) { best = c; bestIdx = s }
      s += 1
    }
    if (bestIdx < 0) fallback else labels(bestIdx)
  }

  /** Occurrence count (duplicates included, null elements skipped) of
    * set members in a token array — one pass, one hash probe per
    * token. See [[TokenSetCount]]. */
  def countInSet(toks: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = toks.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) count += 1
      i += 1
    }
    count
  }

  private val Space = UTF8String.fromString(" ")

  /** Fixed-size token chunks with overlap: windows of `size` tokens
    * advancing by `size - overlap`, each space-joined. The final
    * partial window is kept (it still carries trailing text); empty
    * input yields no chunks. See [[TokenChunks]]. */
  def tokenChunks(toks: ArrayData, size: Int, overlap: Int): ArrayData = {
    val cnt = toks.numElements()
    val stride = size - overlap
    val out = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < cnt) {
      val until = math.min(i + size, cnt)
      val parts = new Array[UTF8String](until - i)
      var j = i
      while (j < until) { parts(j - i) = toks.getUTF8String(j); j += 1 }
      out += UTF8String.concatWs(Space, parts: _*)
      if (until == cnt) i = cnt else i += stride
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct word n-gram shingles (first-occurrence order) from a
    * token array — same contract as the declarative
    * `TextFunctions.wordShingles`: fewer than n tokens yields the
    * whole space-joined token sequence as a single shingle; null
    * tokens are skipped inside each join (concat_ws semantics). */
  def wordShingles(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    val out = new mutable.LinkedHashSet[UTF8String]
    def join(from: Int, until: Int): UTF8String = {
      val parts = new Array[UTF8String](until - from)
      var i = from
      while (i < until) { parts(i - from) = toks.getUTF8String(i); i += 1 }
      UTF8String.concatWs(Space, parts: _*)
    }
    if (cnt - (n - 1) >= 1) {
      var i = 0
      while (i + n <= cnt) { out += join(i, i + n); i += 1 }
    } else out += join(0, cnt)
    new GenericArrayData(out.toArray[Any])
  }

  /** Whole MinHash band-key derivation for ONE document in ONE pass —
    * the streaming-side twin of the batch relational chain
    * (explode -> shingleHash32 -> 32 partial-min `minhash_perm` aggs ->
    * band md5s). Bit-identical by construction: the same md5-prefix
    * 32-bit shingle hash, the same [[permMod61]] permutation family,
    * and the same `"$bd|" + md5("m_i,m_j")` key text (decimal min
    * values, comma-joined) as `TextDedup.bandKeyCols`. Batch needs the
    * relational form (signatures are reused by estimate-verify and the
    * index amortizes across operators); a stream needs the per-row
    * form (no groupBy re-shuffle per micro-batch). Parity is pinned by
    * StreamNearDupSpec against the batch candidate set. */
  def minhashBandKeys(sh: ArrayData, as: Array[Long], bs: Array[Long],
      bands: Int): ArrayData = {
    val nH = as.length
    val rows = nH / bands
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val mins = Array.fill(nH)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val d = md.digest(sh.getUTF8String(i).getBytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < nH) {
        val v = permMod61(h, as(j), bs(j))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](bands)
    var bd = 0
    while (bd < bands) {
      val sb = new java.lang.StringBuilder
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append(',')
        sb.append(mins(bd * rows + r))
        r += 1
      }
      val hex = md.digest(sb.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      out(bd) = UTF8String.fromString(s"$bd|$hex")
      bd += 1
    }
    new GenericArrayData(out)
  }

  /** EVERY word n-gram position (duplicates kept, document order) —
    * the LM-statistics variant of [[wordShingles]] (which dedups for
    * set similarity). Same short-doc contract: fewer than n tokens
    * yields the whole joined sequence as one gram. */
  def wordNgrams(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    def join(from: Int, until: Int): UTF8String = {
      val parts = new Array[UTF8String](until - from)
      var i = from
      while (i < until) { parts(i - from) = toks.getUTF8String(i); i += 1 }
      UTF8String.concatWs(Space, parts: _*)
    }
    if (cnt - (n - 1) >= 1) {
      val out = new Array[Any](cnt - n + 1)
      var i = 0
      while (i + n <= cnt) { out(i) = join(i, i + n); i += 1 }
      new GenericArrayData(out)
    } else new GenericArrayData(Array[Any](join(0, cnt)))
  }

  /** EVERY char n-gram position (duplicates kept, document order) —
    * the tokenizer-statistics variant of the char shingles (which
    * dedup for set similarity): BPE-style merge candidates are counted
    * over all positions. Char starts are found once (UTF-8
    * continuation bytes carry the 10xxxxxx prefix) and each gram is a
    * zero-copy slice of the token's byte array — the same O(len)
    * discipline as [[minShingleHash]]. Shorter-than-n text yields the
    * whole text as its single gram (the charShingles guard). */
  def charNgrams(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val starts = charStarts(bytes)
    val nChars = starts.length - 1
    if (nChars - (n - 1) < 1) return new GenericArrayData(Array[Any](text))
    val out = new Array[Any](nChars - n + 1)
    var i = 0
    while (i + n <= nChars) {
      out(i) = UTF8String.fromBytes(bytes, starts(i), starts(i + n) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Gopher-style repetition ratio in ONE pass:
    * `round(1 - |distinct shingles| / positions, 6)` with the same
    * shingle contract as [[wordShingles]] and the same rounding as
    * Spark's `round(_, 6)` ([[CentroidKernel.round6]]). A single
    * kernel so filters on the ratio inline ONE tokenization +
    * ONE pass under predicate pushdown, not the tokens-referenced-
    * twice tree of the declarative form (FilterExec has no
    * subexpression elimination — NOTES finding #11). */
  def repetitionRatio(toks: ArrayData, n: Int): Double = {
    val sh = wordShingles(toks, n)
    val positions = math.max(toks.numElements() - (n - 1), 1)
    CentroidKernel.round6(1.0 - sh.numElements().toDouble / positions.toDouble)
  }
}

/** Native `minhash_band_keys(shingles)`: the full per-document MinHash
  * band-key derivation in one call. See [[ShingleOps.minhashBandKeys]];
  * coefficients come from the same deterministic md5-derived family as
  * the batch `minhash_perm` aggregates. */
case class MinhashBandKeys(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {

  require(bands > 0 && numHashes % bands == 0,
    s"bands ($bands) must divide numHashes ($numHashes)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val (as, bs) = {
    val cs = graft.functions.TextFunctions.minhashCoefficients(numHashes)
    (cs.map(_._1).toArray, cs.map(_._2).toArray)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects array<string>, got $other")
  }

  override def nullSafeEval(sh: Any): Any =
    ShingleOps.minhashBandKeys(sh.asInstanceOf[ArrayData], as, bs, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.ShingleOps.minhashBandKeys($c, $aRef, $bRef, $bands)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashBandKeys =
    copy(child = newChild)

  override def prettyName: String = "minhash_band_keys"
}

/** Native `word_ngrams(tokens)`: every n-gram position, duplicates
  * kept. See [[ShingleOps.wordNgrams]]. */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects array<string>, got $other")
  }

  override def nullSafeEval(toks: Any): Any =
    ShingleOps.wordNgrams(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.ShingleOps.wordNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

/** Native `char_ngrams(text)`: every char n-gram position, duplicates
  * kept. See [[ShingleOps.charNgrams]]. */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects string, got $other")
  }

  override def nullSafeEval(text: Any): Any =
    ShingleOps.charNgrams(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.ShingleOps.charNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)

  override def prettyName: String = "char_ngrams"
}

/** Native `repetition_ratio(tokens)`: the one-pass filter-safe
  * repetition signal. See [[ShingleOps.repetitionRatio]]. */
case class RepetitionRatio(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects array<string>, got $other")
  }

  override def nullSafeEval(toks: Any): Any =
    ShingleOps.repetitionRatio(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.ShingleOps.repetitionRatio($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionRatio =
    copy(child = newChild)

  override def prettyName: String = "repetition_ratio"
}

/** Native `min_shingle_hash(text)`: the 1-hash MinHash over char
  * k-grams, codegen'd. See [[ShingleOps.minShingleHash]]. */
case class MinShingleHash(child: Expression, k: Int, salt: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects a string column, got ${child.dataType}")

  override def nullSafeEval(text: Any): Any =
    ShingleOps.minShingleHash(text.asInstanceOf[UTF8String], k, salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.ShingleOps.minShingleHash($c, $k, $salt)")

  override protected def withNewChildInternal(newChild: Expression): MinShingleHash =
    copy(child = newChild)

  override def prettyName: String = "min_shingle_hash"
}

/** Native `token_chunks(tokens)`: overlapping fixed-token windows as
  * an `array<string>`, codegen'd — the chunking step of embedding/RAG
  * pipelines. See [[ShingleOps.tokenChunks]]. */
case class TokenChunks(child: Expression, size: Int, overlap: Int)
    extends UnaryExpression {

  require(size > 0 && overlap >= 0 && overlap < size,
    s"need 0 <= overlap < size, got size=$size overlap=$overlap")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects array<string>, got $other")
  }

  override def nullSafeEval(toks: Any): Any =
    ShingleOps.tokenChunks(toks.asInstanceOf[ArrayData], size, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.ShingleOps.tokenChunks($c, $size, $overlap)")

  override protected def withNewChildInternal(newChild: Expression): TokenChunks =
    copy(child = newChild)

  override def prettyName: String = "token_chunks"
}

/** Native `nfc_normalize(text)`: Unicode canonical composition,
  * codegen'd. See [[ShingleOps.nfc]]. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects a string column, got ${child.dataType}")

  override def nullSafeEval(text: Any): Any =
    ShingleOps.nfc(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.ShingleOps.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

/** Native `quality_score(tokens, n_chars)`: the four-band heuristic
  * quality score in ONE pass — the filter-safe form of the derived
  * column (same rationale as [[MarkerArgmax]]: curation pipelines
  * FILTER on this value, and predicate pushdown inlines it into a
  * FilterExec that performs no subexpression elimination). */
case class QualityScore(toks: Expression, nChars: Expression,
    stop: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = toks
  override def right: Expression = nChars

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stop.size * 2)
    stop.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (toks.dataType, nChars.dataType) match {
      case (ArrayType(StringType, _), org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expects (array<string>, int), got $other")
    }

  override def nullSafeEval(t: Any, c: Any): Any =
    ShingleOps.qualityScore(t.asInstanceOf[ArrayData],
      c.asInstanceOf[Int], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet,
      classOf[java.util.HashSet[_]].getName)
    defineCodeGen(ctx, ev,
      (t, c) => s"graft.functions.expr.ShingleOps.qualityScore($t, $c, $setRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QualityScore =
    copy(toks = newLeft, nChars = newRight)

  override def prettyName: String = "quality_score"
}

/** Native `marker_argmax(tokens)`: language-ID style argmax over
  * marker-word counts — first declared label wins ties, `fallback` on
  * zero evidence — in ONE codegen call.
  *
  * Why it exists: the declarative pick (a CASE chain over per-language
  * count columns) is fine inside a Project, but the moment a caller
  * FILTERS on the picked label, predicate pushdown substitutes the
  * whole CASE below the projection — and `FilterExec` performs no
  * subexpression elimination, so every count subtree is re-evaluated
  * per branch (measured ~16 token-set passes per row on the stratified
  * -sample query). A single kernel call stays cheap wherever the
  * optimizer inlines it. */
case class MarkerArgmax(child: Expression,
    markers: Seq[(String, Seq[String])], fallback: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    markers.map { case (_, ws) =>
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  @transient private lazy val labels: Array[UTF8String] =
    markers.map { case (l, _) => UTF8String.fromString(l) }.toArray

  @transient private lazy val fb: UTF8String = UTF8String.fromString(fallback)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects array<string>, got $other")
  }

  override def nullSafeEval(toks: Any): Any =
    ShingleOps.markerArgmax(toks.asInstanceOf[ArrayData], sets, labels, fb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("markerSets", sets,
      "java.util.HashSet[]")
    val labelsRef = ctx.addReferenceObj("markerLabels", labels,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val fbRef = ctx.addReferenceObj("markerFallback", fb)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.ShingleOps.markerArgmax($c, $setsRef, $labelsRef, $fbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerArgmax =
    copy(child = newChild)

  override def prettyName: String = "marker_argmax"
}

/** Native `minhash_perm(h)`: one universal-hash permutation
  * `(a*h + b) mod 2^61-1` of a nonnegative long, codegen'd. See
  * [[ShingleOps.permMod61]] for the 128-bit-exact reduction and why
  * the decimal alternative is slow. */
case class MinhashPerm(child: Expression, a: Long, b: Long)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects a bigint column, got ${child.dataType}")

  override def nullSafeEval(h: Any): Any =
    ShingleOps.permMod61(h.asInstanceOf[Long], a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.ShingleOps.permMod61($c, ${a}L, ${b}L)")

  override protected def withNewChildInternal(newChild: Expression): MinhashPerm =
    copy(child = newChild)

  override def prettyName: String = "minhash_perm"
}

/** Native `token_set_count(tokens)`: occurrence count of a fixed word
  * set in a token array, codegen'd — one pass with a hash probe per
  * token. The declarative alternatives are both worse: `size(filter(
  * toks, _.isin(words)))` is an interpreted per-token lambda
  * (CodegenFallback), and the codegen'd `size(toks) -
  * size(array_remove(toks, w))` per word allocates |words| full array
  * copies per row. Used by language-ID marker counting and
  * stopword-ratio quality scoring. */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects array<string>, got $other")
  }

  override def nullSafeEval(toks: Any): Any =
    ShingleOps.countInSet(toks.asInstanceOf[ArrayData], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet,
      classOf[java.util.HashSet[_]].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.ShingleOps.countInSet($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
    copy(child = newChild)

  override def prettyName: String = "token_set_count"
}

/** Native `word_shingles(tokens)`: distinct word n-grams as an
  * `array<string>`, codegen'd. See [[ShingleOps.wordShingles]]. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects array<string>, got $other")
  }

  override def nullSafeEval(toks: Any): Any =
    ShingleOps.wordShingles(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.ShingleOps.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}
