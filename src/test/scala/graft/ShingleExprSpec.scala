package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Specs for the native codegen'd shingling kernels: value parity with
  * the declarative higher-order-function reference forms
  * (`minHash(charShingles(...))`, `wordShingles`) across edge shapes —
  * short/empty docs, multibyte characters, duplicate shingles — and on
  * both the codegen and interpreted execution paths.
  */
class ShingleExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaaaa aaaaa aaaaa", // duplicate shingles
    "ab", // shorter than k=5 -> whole text is the single shingle
    "", // empty
    "héllo wörld düplex héllo wörld", // multibyte chars
    "one two", // fewer than n=3 tokens
    "x", // single token, shorter than k
    "  padded   with   runs  of spaces  ")

  test("minShingleHash equals the declarative charShingles+minHash form") {
    val df = texts.toDF("text")
    val rows = df.select(
      minShingleHash(col("text"), 5, 0).as("native"),
      contentFingerprint(col("text"), 5).getField("min_shingle_hash").as("hof"))
      .as[(String, String)].collect()
    rows.foreach { case (n, h) => assert(n == h, s"mismatch: $n != $h") }
  }

  test("wordShinglesNative equals the declarative wordShingles form") {
    val df = texts.toDF("text")
    val rows = df.select(
      wordShinglesNative(tokens(col("text")), 3).as("native"),
      wordShingles(tokens(col("text")), 3).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (n, h) =>
      assert(n == h, s"order-preserving distinct must match: $n != $h")
    }
  }

  test("tokens (array_remove form) drops exactly the empty strings") {
    val out = Seq("  a  b ", "", "   ", "one").toDF("t")
      .select(tokens(col("t"))).as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("a", "b"), Seq(), Seq(), Seq("one")))
  }

  test("nfc normalization composes decomposed accents; normalize canonicalizes") {
    import graft.operators.TextAnalysis
    val decomposed = "Café  du   Monde" // e + combining acute
    val out = TextAnalysis.normalize(
      Seq((1L, decomposed), (2L, "  Café du Monde ")).toDF("doc_id", "text"),
      "doc_id", "text")
      .orderBy("doc_id").select("norm_text").as[String].collect()
    assert(out(0) == "café du monde", "NFC must compose e+combining-acute")
    assert(out(0) == out(1), "both encodings canonicalize to the same bytes")
  }

  test("new kernels are callable from SQL via GraftExtensions") {
    val sh = spark.sql(
      "SELECT word_shingles(array('a','b','c'), 2) AS s").as[Seq[String]].head()
    assert(sh == Seq("a b", "b c"))
    val mh = spark.sql(
      "SELECT min_shingle_hash('hello world', 5, 0) AS h").as[String].head()
    assert(mh.length == 16 && mh.matches("[0-9a-f]{16}"))
    val ch = spark.sql(
      "SELECT token_chunks(array('a','b','c','d','e'), 3, 1) AS c")
      .as[Seq[String]].head()
    assert(ch == Seq("a b c", "c d e"))
    assert(spark.sql("SELECT nfc_normalize('abc') AS n").as[String].head() == "abc")
    val ng = spark.sql(
      "SELECT word_ngrams(array('a','b','a','b'), 2) AS g").as[Seq[String]].head()
    assert(ng == Seq("a b", "b a", "a b"), "duplicates kept, document order")
    val rr = spark.sql(
      "SELECT repetition_ratio(array('a','b','a','b','a'), 3) AS r").as[Double].head()
    assert(rr == 0.333333, "3 positions, 2 distinct 3-grams -> 1 - 2/3 at 6dp")
    val bk = spark.sql(
      "SELECT minhash_band_keys(word_shingles(array('x','y','z','w'), 3), 32, 16) AS k")
      .as[Seq[String]].head()
    assert(bk.length == 16 && bk.zipWithIndex.forall { case (s, i) =>
      s.startsWith(s"$i|") && s.length == 32 + 2 + (if (i >= 10) 1 else 0) },
      "16 band keys, '<band>|<md5hex>' shape")
  }

  test("survives both codegen and interpreted paths") {
    // Non-foldable physical source (VERDICT r06 item 5): a literal
    // fixture constant-folds, so the compiled arm would never run.
    val df = TestSpark.nonFoldable(Seq("five chars here"))
    def run(): (String, Seq[String], Seq[String], Double, Seq[String]) = df.select(
      minShingleHash(col("text"), 5, 0),
      wordShinglesNative(tokens(col("text")), 2),
      wordNgramsNative(tokens(col("text")), 2),
      repetitionRatioNative(tokens(col("text")), 2),
      charNgramsNative(col("text"), 4))
      .as[(String, Seq[String], Seq[String], Double, Seq[String])].head()
    val withCodegen = run()
    // Genuine eval()-path twin: NO_CODEGEN factories, not just
    // whole-stage off (which still compiles the projection).
    assert(TestSpark.interpreted(run()) == withCodegen)
    assert(withCodegen._2 == Seq("five chars", "chars here"))
  }

  test("charNgrams: all positions, multibyte chars, short-text fallback") {
    // Parity with the declarative HOF form on every fixture text.
    val rows = texts.toDF("text").select(
      charNgramsNative(col("text"), 2).as("native"),
      when(length(col("text")) >= 2,
        transform(sequence(lit(1), length(col("text")) - 1),
          i => col("text").substr(i, lit(2))))
        .otherwise(array(col("text"))).as("ref"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (n, r) =>
      assert(n == r, s"all-position char bigrams must match the HOF form: $n != $r")
    }
    // Multibyte: grams slice at CHAR boundaries, never bytes.
    val uni = Seq("héĳo").toDF("text")
      .select(charNgramsNative(col("text"), 2)).as[Seq[String]].head()
    assert(uni == Seq("hé", "éĳ", "ĳo"))
    // SQL registration.
    val sql = spark.sql("SELECT char_ngrams('abcd', 3) AS g").as[Seq[String]].head()
    assert(sql == Seq("abc", "bcd"))
  }
}
