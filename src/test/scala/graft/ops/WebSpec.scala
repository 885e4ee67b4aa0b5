package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Map[String, (String, String, String)] =
    Web.canonicalize(urls.toList.toDF("url"), "url")
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap

  test("canonicalize lower-cases, strips default ports and www, sorts params") {
    val got = canon("HTTP://WWW.News.Example.COM:80/a/b?b=2&utm_source=x&a=1#frag")
    got.values.head shouldBe (("news.example.com", "example.com",
      "http://news.example.com/a/b?a=1&b=2"))
  }

  test("canonicalize collapses duplicate slashes, strips trailing slash, keeps non-default port") {
    canon("https://cdn.site.org:443//img///logo/").values.head._3 shouldBe
      "https://cdn.site.org/img/logo"
    // non-default port survives (a real origin distinction)
    canon("https://site.org:8443/x").values.head._3 shouldBe
      "https://site.org:8443/x"
    // http's default is :80 only — :443 on http is a real (odd) origin
    canon("http://site.org:443/x").values.head._3 shouldBe
      "http://site.org:443/x"
  }

  test("canonicalize: empty path becomes /, tracking-only query drops the ?") {
    canon("http://a.io?utm_campaign=c&gclid=1&fbclid=2&ref=hn").values.head._3 shouldBe
      "http://a.io/"
  }

  test("canonicalize: single-label host passes through registrableDomain; schemeless input yields null canon") {
    val got = Web.canonicalize(Seq("http://localhost/x", "not a url").toDF("url"), "url")
      .select("url", "host", "domain", "url_canon").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2), Option(r.getString(3)))))
      .toMap
    got("http://localhost/x") shouldBe (("localhost", "localhost",
      Some("http://localhost/x")))
    got("not a url")._3 shouldBe None
  }

  test("canonical-URL dedup: transport-noise variants of one page collapse") {
    val variants = Seq(
      "https://Example.com/page/?utm_source=a",
      "https://www.example.com:443/page",
      "https://example.com//page/")
    Web.canonicalize(variants.toDF("url"), "url")
      .select("url_canon").distinct().count() shouldBe 1L
  }

  test("capPerDomain enforces the per-site quota deterministically") {
    val urls = (1L to 90L).map(i =>
      (i, s"https://site${i % 3}.com/p/$i"))
      .toDF("doc_id", "url")
    val got = Web.capPerDomain(urls, "url", "doc_id", maxPages = 10)
    got.count() shouldBe 30L
    got.groupBy("domain").count().collect()
      .foreach(_.getLong(1) shouldBe 10L)
    // determinism: a repartitioned run keeps the identical page set
    val again = Web.capPerDomain(urls.repartition(7), "url", "doc_id", maxPages = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    got.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe again
  }

  test("canonicalize plans no shuffle: the whole chain is map-side") {
    val df = Web.canonicalize(Seq("https://a.com/x").toDF("url"), "url")
    Bucketing.shuffleCount(df) shouldBe 0
  }

  test("hostSuffixes enumerates label-boundary suffixes only") {
    Web.canonicalize(Seq("https://a.b.c.com/x").toDF("url"), "url")
      .select(Web.hostSuffixes(col("host"))).collect().head.getSeq[String](0) shouldBe
      Seq("a.b.c.com", "b.c.com", "c.com", "com")
  }

  test("filterBlockedDomains: suffix semantics, no substring false positives") {
    val rows = Seq(
      (1L, "https://spam.com/a"),        // blocked: exact
      (2L, "https://ads.spam.com/b"),    // blocked: subdomain
      (3L, "https://notspam.com/c"),     // kept: substring is NOT a suffix match
      (4L, "https://spam.com.evil.io/d"),// kept: spam.com is not a label suffix
      (5L, "not a url"))                 // kept: hostless rows pass through
      .toDF("doc_id", "url")
    val block = Seq("spam.com").toDF("domain")
    val kept = Web.filterBlockedDomains(rows, "url", "doc_id", block, "domain")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(3L, 4L, 5L)
  }

  test("filterBlockedDomains: transport forms of a blocked site cannot slip through") {
    val rows = Seq(
      (1L, "https://spam.com:8080/x"),   // non-default port
      (2L, "https://u@spam.com/y"),      // userinfo
      (3L, "https://spam.com./z"),       // FQDN trailing dot
      (4L, "https://ok.org:8080/w"))     // same forms on an unblocked site
      .toDF("doc_id", "url")
    val block = Seq("spam.com").toDF("domain")
    Web.filterBlockedDomains(rows, "url", "doc_id", block, "domain")
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(4L)
    // and domain identity ignores the port for quotas too
    Web.canonicalize(rows, "url").select("doc_id", "domain").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
      .view.filterKeys(_ <= 3L).toMap.values.toSet shouldBe Set("spam.com")
  }

  test("a '?' that first appears inside the fragment is not a query") {
    val got = canon("https://a.com/p#section?x=1",
      "https://a.com/#!/view?id=3")
    got("https://a.com/p#section?x=1")._3 shouldBe "https://a.com/p"
    got("https://a.com/#!/view?id=3")._3 shouldBe "https://a.com/"
  }

  test("filterBlockedDomains plans equi-joins only — no nested loop at any blocklist size") {
    val rows = (1L to 50L).map(i => (i, s"https://site$i.com/p")).toDF("doc_id", "url")
    val block = (1L to 10L).map(i => s"site$i.com").toDF("domain")
    val df = Web.filterBlockedDomains(rows, "url", "doc_id", block, "domain")
    PlanAudit.forbiddenJoins(df) shouldBe empty
    df.count() shouldBe 40L
  }

  test("parseHttp: CRLF and bare-LF endings, quoted charset, degenerate payloads") {
    val rows = Seq(
      (1L, "HTTP/1.1 200 OK\r\nContent-Type: text/HTML; charset=\"UTF-8\"\r\n\r\nbody here"),
      (2L, "HTTP/1.0 404 Not Found\nContent-Type: text/plain\n\nmissing"),
      (3L, "HTTP/1.1 301 Moved\r\nLocation: https://x.com/\r\n\r\n"),
      (4L, "HTTP/1.1 200 OK\r\nContent-Type: application/json"), // no blank line
      (5L, "not an http response at all"))
      .toDF("id", "raw")
    val got = Web.parseHttp(rows, "raw")
      .select("id", "status_code", "content_type", "charset", "body")
      .collect().map(r => r.getLong(0) -> ((
        Option(r.get(1)), Option(r.getString(2)), Option(r.getString(3)),
        r.getString(4))))
      .toMap
    got(1L) shouldBe ((Some(200L), Some("text/html"), Some("utf-8"), "body here"))
    got(2L) shouldBe ((Some(404L), Some("text/plain"), None, "missing"))
    got(3L) shouldBe ((Some(301L), None, None, ""))
    // headers never terminated: all headers, empty body, type still parsed
    got(4L) shouldBe ((Some(200L), Some("application/json"), None, ""))
    got(5L) shouldBe ((None, None, None, ""))
  }

  test("crawl chain composes: parseHttp -> stripHtml -> canonical host") {
    val fetch = Seq((1L,
      "https://WWW.Site.com:443/a/?utm_source=x",
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html><body><p>Hello <b>world</b></p><script>x()</script></body></html>"))
      .toDF("id", "url", "raw")
    val parsed = Web.canonicalize(Web.parseHttp(fetch, "raw"), "url")
      .withColumn("text", TextAnalysis.stripHtml(col("body")))
      .select("url_canon", "content_type", "text").collect().head
    parsed.getString(0) shouldBe "https://site.com/a"
    parsed.getString(1) shouldBe "text/html"
    parsed.getString(2) shouldBe "Hello world"
  }

  test("metaRobots: directive parse, none implies both, missing tag indexable") {
    import spark.implicits._
    val pages = Seq(
      (1L, """<html><head><meta name="robots" content="noindex, nofollow"></head></html>"""),
      (2L, "<HTML><HEAD><META NAME='robots' CONTENT='NOFOLLOW'></HEAD></HTML>"),
      (3L, """<head><meta name="robots" content="none"></head>"""),
      (4L, "<html><head><title>t</title></head><body>plain</body></html>"),
      // attribute order is free in HTML: content before name, and
      // intervening attributes, must gate the same as name-first
      (5L, """<head><meta content="noindex" name="robots"></head>"""),
      (6L, """<head><meta name="robots" id="x" content="nofollow"></head>""")
    ).toDF("doc_id", "html")
    val got = Web.metaRobots(pages, "html")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("robots_content"), r.getAs[Boolean]("noindex"),
          r.getAs[Boolean]("nofollow"), r.getAs[Boolean]("indexable"))).toMap
    got(1L) shouldBe (("noindex, nofollow", true, true, false))
    got(2L) shouldBe (("nofollow", false, true, true)) // case-folded tag and value
    got(3L) shouldBe (("none", true, true, false)) // the shorthand implies both
    got(4L) shouldBe (("", false, false, true))
    got(5L) shouldBe (("noindex", true, false, false)) // content-first order
    got(6L) shouldBe (("nofollow", false, true, true)) // intervening attribute
  }

  test("canonicalization is idempotent: canonical URLs are fixed points") {
    // property over a messy generated corpus: re-canonicalizing the
    // canonical form changes nothing (otherwise "canonical" keys drift
    // on every pipeline pass and URL-dedup is unstable)
    val messy = (0 until 200).map { i =>
      val scheme = if (i % 2 == 0) "HTTP" else "https"
      val www = if (i % 3 == 0) "WWW." else ""
      val port = i % 4 match {
        case 0 => ":80"
        case 1 => ":443"
        case 2 => ":8080"
        case _ => ""
      }
      val path = Seq("", "/", "//a", s"/p$i/", s"/x//y$i///").apply(i % 5)
      val query = Seq("", "?b=2&a=1", "?utm_source=s&z=9", "?ref=r", "?a=1#f").apply(i % 5)
      s"$scheme://${www}Host$i.Example.ORG$port$path$query"
    }.toDF("url")
    val once = Web.canonicalize(messy, "url")
      .select(col("url_canon").as("url")).filter(col("url").isNotNull)
    val twice = Web.canonicalize(once, "url")
      .filter(col("url_canon") =!= col("url"))
    twice.count() shouldBe 0L
  }

  test("robotsRules: header runs, star groups, comments, empty prefixes") {
    import spark.implicits._
    val robots = Seq(
      ("a.com", "User-agent: bot\nUser-agent: *\nDisallow: /private # secret\n" +
        "Allow: /private/ok\n\nUser-agent: other\nDisallow: /all"),
      ("b.com", "User-agent: *\nDisallow:\n"),  // empty prefix: allows all
      ("c.com", "# nothing\nUser-agent: special\nDisallow: /x")
    ).toDF("domain", "robots_txt")
    val got = Web.robotsRules(robots, "domain", "robots_txt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    got shouldBe Set(
      ("a.com", "disallow", "/private"),
      ("a.com", "allow", "/private/ok"))
  }

  test("robotsRules: directive names case-insensitive, prefixes case-PRESERVED") {
    import spark.implicits._
    val robots = Seq(
      ("u.com", "USER-AGENT: *\nDISALLOW: /CGI-BIN\nAllow: /CGI-BIN/pub")
    ).toDF("domain", "robots_txt")
    val got = Web.robotsRules(robots, "domain", "robots_txt")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    // RFC 9309: lowercasing the prefix would fail the gate OPEN on
    // any uppercase path characters
    got shouldBe Set(("disallow", "/CGI-BIN"), ("allow", "/CGI-BIN/pub"))
  }

  test("robotsAllowed: byte-literal RAW path - directory rules keep their slash") {
    import spark.implicits._
    val rules = Seq(("a.com", "disallow", "/private/"))
      .toDF("domain", "rule", "prefix")
    val urls = Seq(
      "https://a.com/private/",      // raw path keeps the trailing slash
      "https://a.com/private",       // the directory itself, no slash
      "https://a.com/CGI-BIN/x"
    ).toDF("url")
    val got = Web.robotsAllowed(urls, rules, "url")
      .collect().map(r => r.getString(0) ->
        (r.getAs[String]("path"), r.getAs[Boolean]("allowed"))).toMap
    got("https://a.com/private/") shouldBe (("/private/", false))
    got("https://a.com/private") shouldBe (("/private", true))
    got("https://a.com/CGI-BIN/x") shouldBe (("/CGI-BIN/x", true))
  }

  test("robotsAllowed: longest match wins, allow breaks ties, default allow") {
    import spark.implicits._
    val rules = Seq(
      ("a.com", "disallow", "/private"), ("a.com", "allow", "/private/ok"),
      ("t.com", "disallow", "/p"), ("t.com", "allow", "/p")
    ).toDF("domain", "rule", "prefix")
    val urls = Seq(
      "https://a.com/private/x", "https://a.com/private/ok/page",
      "https://a.com/pub", "https://b.com/anything", "https://t.com/p/q"
    ).toDF("url")
    val got = Web.robotsAllowed(urls, rules, "url")
      .collect().map(r => r.getString(0) ->
        (r.getAs[String]("matched_rule"), r.getAs[String]("matched_prefix"),
          r.getAs[Boolean]("allowed"))).toMap
    got("https://a.com/private/x") shouldBe (("disallow", "/private", false))
    got("https://a.com/private/ok/page") shouldBe (("allow", "/private/ok", true))
    got("https://a.com/pub") shouldBe (("", "", true))
    got("https://b.com/anything") shouldBe (("", "", true))
    got("https://t.com/p/q") shouldBe (("allow", "/p", true)) // tie -> allow
  }
}
