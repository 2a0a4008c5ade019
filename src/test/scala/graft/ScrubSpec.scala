package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Scrub

/** PII scrubbing / URL hygiene (graft.pipeline.Scrub). */
class ScrubSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "Write to alice.smith+work@mail.example.com or bob@sub.test.org today"),
    (2L, "Server at 192.168.1.100 and backup at 10.0.0.7 are both up"),
    (3L, "Call +1-555-123-4567 or (212) 555 0199 after five"),
    (4L, "See https://docs.example.com/guide?x=1 and http://blog.test.io/post#top"),
    (5L, "No sensitive content in this row at all")
  ).toDF("doc_id", "text")

  test("detection counts per category") {
    val r = docs.select($"doc_id",
      Scrub.emailCount($"text").as("e"), Scrub.ipv4Count($"text").as("i"),
      Scrub.phoneCount($"text").as("p"), Scrub.urlCount($"text").as("u"))
      .orderBy($"doc_id").collect()
    assert(r.map(_.getInt(1)).toSeq == Seq(2, 0, 0, 0, 0)) // emails
    assert(r.map(_.getInt(2)).toSeq == Seq(0, 2, 0, 0, 0)) // ipv4
    assert(r.map(_.getInt(3)).toSeq == Seq(0, 0, 2, 0, 0)) // phones
    assert(r.map(_.getInt(4)).toSeq == Seq(0, 0, 0, 2, 0)) // urls
  }

  test("redaction replaces every hit and leaves clean text unchanged") {
    val red = docs.select($"doc_id", Scrub.redactPii($"text").as("t"))
      .orderBy($"doc_id").as[(Long, String)].collect().toMap
    assert(red(1L) == "Write to <EMAIL> or <EMAIL> today")
    assert(red(2L) == "Server at <IP> and backup at <IP> are both up")
    assert(red(3L) == "Call <PHONE> or <PHONE> after five")
    assert(red(5L) == "No sensitive content in this row at all")
    val noUrl = docs.select(Scrub.redactUrls($"text")).as[String].collect()
    assert(noUrl.exists(_ == "See <URL> and <URL>"))
  }

  test("hasPii pre-filter") {
    val flagged = docs.filter(Scrub.hasPii($"text")).select("doc_id")
      .as[Long].collect().toSet
    assert(flagged == Set(1L, 2L, 3L))
  }

  test("domain extraction lowercases and strips path/port") {
    val d = Seq("go to HTTPS://Docs.Example.COM:8443/x and https://a.b.c/d?q=1")
      .toDF("text").select(Scrub.urlDomains($"text")).as[Seq[String]].collect()(0)
    assert(d == Seq("docs.example.com", "a.b.c"))
  }

  test("canonicalUrl: case, default ports, tracking params, fragments, slashes") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host lowercased, :80 stripped for http, leading tracking
      // param removed with separator repair, fragment dropped
      ("HTTP://EXAMPLE.com:80/a/b?utm_source=t&x=1&fbclid=zz#top",
        "http://example.com/a/b?x=1"),
      // :443 stripped for https only; path case preserved
      ("https://Site.Example.ORG:443/Path?id=5&utm_campaign=y",
        "https://site.example.org/Path?id=5"),
      // root slash and empty query trimmed
      ("https://x.com/", "https://x.com"),
      ("https://x.com/p?utm_a=1", "https://x.com/p"),
      // non-default port kept
      ("https://X.com:8080/p", "https://x.com:8080/p"),
      // adjacent tracking params, gclid/msclkid
      ("https://a.io/q?utm_a=1&utm_b=2&c=3&gclid=g&msclkid=m",
        "https://a.io/q?c=3"),
      // scheme-less input: nothing to canonicalize — pass through verbatim
      ("example.com/path?utm_a=1", "example.com/path?utm_a=1"),
      // literal '&' in the PATH (legal, unusual) must survive separator
      // repair: only the '&' at the removed-'?' byte position flips
      ("https://a.io/a&b?utm_x=1&c=2", "https://a.io/a&b?c=2"),
      // literal '&' in the path with nothing removed — untouched
      ("https://a.io/a&b?c=2", "https://a.io/a&b?c=2"))
    val out = cases.map(_._1).toDF("u")
      .select(Scrub.canonicalUrl($"u")).as[String].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(got === want)
    }
  }

  test("blocklist filter drops only documents hitting a blocked host") {
    val kept = Scrub.filterBlockedDomains(docs, "text", Seq("blog.test.io"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 5L))
    val keptNone = Scrub.filterBlockedDomains(docs, "text", Seq("other.example"))
      .count()
    assert(keptNone == 5)
  }

  test("urlDomains skips userinfo; blocklist cannot be bypassed with '@'") {
    val docs = Seq(
      (1L, "see http://foo@blockedsite.com/x now"),
      (2L, "see http://user:pw@blockedsite.com/ now"),
      (3L, "see http://fine.example.org/a@b now") // '@' in the PATH is not userinfo
    ).toDF("doc_id", "text")
    val doms = docs.select($"doc_id", Scrub.urlDomains($"text").as("d"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(doms(1L) === Seq("blockedsite.com"))
    assert(doms(2L) === Seq("blockedsite.com"))
    assert(doms(3L) === Seq("fine.example.org"))
    assert(Scrub.filterBlockedDomains(docs, "text", Seq("blockedsite.com"))
      .select($"doc_id").as[Long].collect().toSet === Set(3L))
  }

  test("canonicalUrl strips tracking params only from the QUERY, not the path") {
    val df = Seq(
      (1L, "https://ex.com/a&gclid=z"),            // '&gclid' in the path: keep
      (2L, "https://ex.com/a?gclid=z"),            // real tracking param: strip
      (3L, "https://ex.com/a&gclid=z?utm_k=1&id=2") // path kept, query cleaned
    ).toDF("id", "u")
    val got = df.select($"id", Scrub.canonicalUrl($"u").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "https://ex.com/a&gclid=z", got(1L))
    assert(got(2L) === "https://ex.com/a", got(2L))
    assert(got(3L) === "https://ex.com/a&gclid=z?id=2", got(3L))
  }
}
