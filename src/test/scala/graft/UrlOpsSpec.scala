package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UrlOps

/** Hand-computed canonicalization cases for [[UrlOps.normalize]]
  * (q92): case folding, www/default-port stripping, trailing-slash
  * and empty-path rules, tracking-param removal + param sorting,
  * fragment dropping, registered-domain heuristic and its single-label
  * fallback, null propagation. */
class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(urls: Seq[Option[String]]): Seq[(String, String, String)] =
    UrlOps.normalize(
      urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("doc_id", "url"),
      "doc_id", "url")
      .orderBy("doc_id")
      .as[(Long, Option[String], Option[String], Option[String])]
      .collect().toSeq
      .map(r => (r._2.orNull, r._3.orNull, r._4.orNull))

  test("canonicalization rules, each pinned") {
    val out = norm(Seq(
      Some("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag"),
      Some("http://Sub.Site.ORG:8080/"),
      Some("https://example.com"),
      Some("https://example.com/?ref=x&utm_campaign=y"),
      Some("https://localhost/x"),
      Some("https://www.example.com:8443/p"),
      Some("http://example.com:80/q?z=1"),
      None))
    assert(out(0) == (("example.com", "example.com", "https://example.com/a/b?a=1&b=2")))
    assert(out(1) == (("sub.site.org:8080", "site.org", "http://sub.site.org:8080/")))
    assert(out(2) == (("example.com", "example.com", "https://example.com/")))
    assert(out(3) == (("example.com", "example.com", "https://example.com/")))
    assert(out(4) == (("localhost", "localhost", "https://localhost/x")))
    assert(out(5) == (("example.com:8443", "example.com", "https://example.com:8443/p")))
    assert(out(6) == (("example.com", "example.com", "http://example.com/q?z=1")))
    assert(out(7) == ((null, null, null)))
  }

  test("param order never distinguishes two URLs; tracking params never do") {
    val out = norm(Seq(
      Some("https://e.com/p?b=2&a=1"),
      Some("https://e.com/p?a=1&b=2"),
      Some("https://e.com/p?a=1&utm_medium=m&b=2&fbclid=f&gclid=g&msclkid=k&ref=r")))
    assert(out.map(_._3).distinct.size == 1)
  }
}
