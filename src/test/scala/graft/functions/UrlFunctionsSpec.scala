package graft.functions

import graft.SparkTestBase
import graft.api.RunContext
import graft.config.TransformConfig
import graft.operators.UrlNormalizeTransform

class UrlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlFunctions.normalizeUrl($"url").as("n"))
      .as[String].collect().toSeq

  test("golden canonicalizations") {
    norm(
      "HTTPS://WWW.Example.COM:443/Path/One?id=1#frag",
      "http://example.com:80/",
      "http://example.com:8080/keep-port",
      "https://example.com/a/?utm_source=feed&id=9&utm_medium=x",
      "https://example.com/a?ref=tw",
      "https://example.com/a?pref=keep&ref=drop&b=2",
      "https://example.com/?utm_campaign=only",
      "https://sub.example.com/CaseSensitive/Path"
    ) shouldBe Seq(
      "https://example.com/Path/One?id=1",
      "http://example.com",
      "http://example.com:8080/keep-port",
      "https://example.com/a?id=9",
      "https://example.com/a",
      "https://example.com/a?pref=keep&b=2",
      "https://example.com",
      "https://sub.example.com/CaseSensitive/Path")
  }

  test("URLs embedded in query values are not rewritten (www./trailing-slash " +
    "steps anchor to the outer URL's own seams)") {
    norm(
      // the embedded https://www.b.com/x/?y=1 must survive verbatim
      "https://a.com/r?u=https://www.b.com/x/?y=1",
      // www. stripped at the real seam even when a query value has one too
      "https://www.a.com/r?u=www.b.com"
    ) shouldBe Seq(
      "https://a.com/r?u=https://www.b.com/x/?y=1",
      "https://a.com/r?u=www.b.com")
  }

  test("host and registrable-domain extraction") {
    val d = Seq("https://News.Example.co/x", "not a url").toDF("url")
    d.select(UrlFunctions.urlHost($"url"), UrlFunctions.urlDomain($"url"))
      .as[(Option[String], Option[String])].collect().toSeq shouldBe Seq(
      (Some("news.example.co"), Some("example.co")), (None, None))
  }

  test("dotless hosts get a null domain, not one shared \"\" group") {
    val d = Seq("http://localhost/x", "http://intranet:8080/y").toDF("url")
    d.select(UrlFunctions.urlHost($"url"), UrlFunctions.urlDomain($"url"))
      .as[(Option[String], Option[String])].collect().toSeq shouldBe Seq(
      (Some("localhost"), None), (Some("intranet"), None))
  }

  test("transform normalizes in place, appends host/domain, zero shuffle") {
    val d = Seq((1L, "HTTP://WWW.A.Com:80/x/?fbclid=abc")).toDF("id", "url")
    val out = UrlNormalizeTransform(d, TransformConfig("u", "url_normalize",
      Map("column" -> "url", "appendHost" -> "host", "appendDomain" -> "dom")),
      RunContext(spark, "t", "r"))
    out.columns.toSeq shouldBe Seq("id", "url", "host", "dom")
    out.as[(Long, String, String, String)].head() shouldBe
      ((1L, "http://a.com/x", "a.com", "a.com"))
    out.queryExecution.executedPlan.toString should not include "Exchange"
    UrlNormalizeTransform.validate(TransformConfig("u", "url_normalize",
      Map("column" -> "nope")), d.schema) should not be empty
  }
}
