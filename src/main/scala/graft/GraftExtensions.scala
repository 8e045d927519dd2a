package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.functions.expr.{CharNgrams, FloatDotProduct, MinhashBandKeys, MinShingleHash, NfcNormalize, RepetitionRatio, TokenChunks, WordNgrams, WordShingles}

/** Catalyst extension point: registers the engine's native expressions
  * as SQL functions, so `spark.sql("... float_dot(a, b) ...")` works
  * anywhere the library is on the classpath — installed either via
  * `.withExtensions(new GraftExtensions)` (Sessions does this) or
  * `spark.sql.extensions=graft.GraftExtensions` on any existing
  * cluster, the standard deployment path for Spark extension libraries.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(
        classOf[FloatDotProduct].getName, null, "float_dot",
        "float_dot(a, b) - dot product of two float arrays in double precision",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "float_dot takes exactly 2 arguments")
        FloatDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(
        classOf[WordShingles].getName, null, "word_shingles",
        "word_shingles(tokens, n) - distinct word n-gram shingles, first-occurrence order",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "word_shingles takes (tokens, n)")
        WordShingles(children.head, intArg(children(1), "word_shingles"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[NfcNormalize].getName, null, "nfc_normalize",
        "nfc_normalize(text) - Unicode NFC canonical composition",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 1, "nfc_normalize takes 1 argument")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("token_chunks"),
      new ExpressionInfo(
        classOf[TokenChunks].getName, null, "token_chunks",
        "token_chunks(tokens, size, overlap) - overlapping fixed-token windows",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 3, "token_chunks takes (tokens, size, overlap)")
        TokenChunks(children.head,
          intArg(children(1), "token_chunks"),
          intArg(children(2), "token_chunks"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(
        classOf[WordNgrams].getName, null, "word_ngrams",
        "word_ngrams(tokens, n) - every word n-gram position, duplicates kept",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "word_ngrams takes (tokens, n)")
        WordNgrams(children.head, intArg(children(1), "word_ngrams"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(
        classOf[CharNgrams].getName, null, "char_ngrams",
        "char_ngrams(text, n) - every char n-gram position, duplicates kept",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "char_ngrams takes (text, n)")
        CharNgrams(children.head, intArg(children(1), "char_ngrams"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_band_keys"),
      new ExpressionInfo(
        classOf[MinhashBandKeys].getName, null, "minhash_band_keys",
        "minhash_band_keys(shingles, numHashes, bands) - per-document LSH band keys",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 3, "minhash_band_keys takes (shingles, numHashes, bands)")
        MinhashBandKeys(children.head,
          intArg(children(1), "minhash_band_keys"),
          intArg(children(2), "minhash_band_keys"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("repetition_ratio"),
      new ExpressionInfo(
        classOf[RepetitionRatio].getName, null, "repetition_ratio",
        "repetition_ratio(tokens, n) - 1 - distinct_shingles/positions, rounded to 6dp",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "repetition_ratio takes (tokens, n)")
        RepetitionRatio(children.head, intArg(children(1), "repetition_ratio"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("min_shingle_hash"),
      new ExpressionInfo(
        classOf[MinShingleHash].getName, null, "min_shingle_hash",
        "min_shingle_hash(text, k, salt) - min salted-md5 hash over char k-gram shingles (16 hex chars)",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 3, "min_shingle_hash takes (text, k, salt)")
        MinShingleHash(children.head,
          intArg(children(1), "min_shingle_hash"),
          intArg(children(2), "min_shingle_hash"))
      }))
  }
}
