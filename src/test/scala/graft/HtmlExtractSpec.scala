package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Hand-computed cases for the HTML extract step (q93): block drops,
  * tag stripping, entity decode order, whitespace collapse, null
  * propagation. */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(html: Seq[Option[String]]): Seq[(Option[String], Option[Int])] =
    TextAnalysis.htmlExtract(
      html.zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("doc_id", "html"),
      "doc_id", "html")
      .orderBy("doc_id")
      .select(col("clean_text"), col("n_chars"))
      .as[(Option[String], Option[Int])].collect().toSeq

  test("block drops, tag strip, entities, whitespace — each pinned") {
    val out = extract(Seq(
      Some("<html><head><title>T</title></head><body><nav>menu</nav>" +
        "<p>Hello   <b>world</b></p><script>if (1 < 2) x();</script>" +
        "<footer>bye</footer></body></html>"),
      Some("<p>Tom &amp; Jerry &lt;3 &quot;ok&quot; it&#39;s</p>"),
      Some("<p>&amp;lt; stays entity</p>"), // amp decoded LAST -> literal &lt;
      Some("<div>a</div>\n\n<div>\tb</div>"),
      Some("<style>p{}</style><style>q{}</style>keep<aside>no</aside>"),
      Some("plain text, no markup"),
      None))
    assert(out(0) == ((Some("Hello world"), Some(11))))
    assert(out(1) == ((Some("Tom & Jerry <3 \"ok\" it's"), Some(24))))
    assert(out(2) == ((Some("&lt; stays entity"), Some(17))))
    assert(out(3) == ((Some("a b"), Some(3))))
    assert(out(4) == ((Some("keep"), Some(4))))
    assert(out(5) == ((Some("plain text, no markup"), Some(21))))
    assert(out(6) == ((None, None)))
  }
}
