package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("url").select(Urls.canonicalizeUrl(col("url"))).head
      .getString(0)

  private def dom(h: String): String =
    Seq(h).toDF("h").select(Urls.registrableDomain(col("h"))).head
      .getString(0)

  private def depth(u: String): Int =
    Seq(u).toDF("url")
      .select(Urls.pathDepth(Urls.canonicalizeUrl(col("url")))).head
      .getInt(0)

  test("canonicalize: case, default port, www, fragment, tracking params") {
    assert(canon("HTTP://News.Example.COM:80/A/b?utm_source=x&id=5" +
        "&utm_campaign=y#f") == "http://news.example.com/A/b?id=5")
    assert(canon("https://www.Shop.example.com:443/p?gclid=z") ==
      "https://shop.example.com/p")
    // mid-query tracking param removed, neighbors stitched
    assert(canon("http://example.org/x?id=1&ref=nav&q=2") ==
      "http://example.org/x?id=1&q=2")
    // leading tracking param followed by a keeper
    assert(canon("http://example.org/x?fbclid=a&q=2") ==
      "http://example.org/x?q=2")
  }

  test("canonicalize preserves what it must") {
    // non-default port survives
    assert(canon("http://example.org:8080/x") ==
      "http://example.org:8080/x")
    // https keeps :80 (not its default), http keeps :443
    assert(canon("https://example.org:80/x") ==
      "https://example.org:80/x")
    // path/query case is significant
    assert(canon("http://example.org/Articles/Item?Q=Aa") ==
      "http://example.org/Articles/Item?Q=Aa")
    // 'referrer' is not 'ref' — prefix must not over-match
    assert(canon("http://example.org/x?referrer=a") ==
      "http://example.org/x?referrer=a")
    // host-only URL is a fixed point
    assert(canon("http://example.com") == "http://example.com")
  }

  test("registrable domain: multi-part public suffixes get eTLD+1") {
    assert(dom("news.example.com") == "example.com")
    assert(dom("example.org") == "example.org")
    assert(dom("blog.sample.co.uk") == "sample.co.uk")
    assert(dom("a.b.example.com.au") == "example.com.au")
    assert(dom("cdn.assets.sample.net") == "sample.net")
  }

  test("path depth counts non-empty segments of the canonical path") {
    assert(depth("http://example.com/Articles/item5?id=1") == 2)
    assert(depth("http://example.com/a/b/c/") == 3)
    assert(depth("http://example.com") == 0)
    assert(depth("http://example.com/?q=1") == 0)
  }

  test("normalize over synthesized corpus: deterministic, all rows canonical") {
    val docs = (0L until 60L).toDF("doc_id")
    val n1 = Urls.normalize(Urls.synthesize(docs)).orderBy("doc_id")
      .collect()
    val n2 = Urls.normalize(Urls.synthesize(docs.repartition(5)))
      .orderBy("doc_id").collect()
    assert(n1.map(_.toSeq).toSeq == n2.map(_.toSeq).toSeq)
    // canonical outputs carry none of the synthesized noise
    n1.foreach { r =>
      val u = r.getString(1)
      assert(!u.matches(".*(utm_|fbclid|gclid|#|:80|:443).*"), u)
      assert(!u.contains("://www."), u)
      assert(u.startsWith("http://") || u.startsWith("https://"), u)
    }
    // the six host shapes collapse to exactly five registrable domains
    assert(n1.map(_.getString(3)).toSet ==
      Set("example.com", "sample.co.uk", "example.org",
        "example.com.au", "sample.net"))
  }

  test("plan shapes: normalize is shuffle-free; the blocklist joins " +
       "as a broadcast anti-join") {
    val docs = (0L until 100L).toDF("doc_id")
    val norm = Urls.normalize(Urls.synthesize(docs))
    assert(!norm.queryExecution.executedPlan.toString.contains("Exchange"),
      "canonicalization must stay a pure projection")
    val stats = Urls.domainStats(norm, Seq("sample.net").toDF("domain"))
    val plan = stats.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"blocklist must broadcast, got:\n$plan")
  }

  test("domainStats: blocklist anti-join excludes, counts are exact") {
    val pages = Seq(
      (0L, "http://a.example.com/x/y"),
      (1L, "http://b.example.com/x"),
      (2L, "HTTP://A.example.com:80/x/y#f"), // same canon host as row 0
      (3L, "http://spam.bad.net/z"),
      (4L, "http://sample.co.uk/only")).toDF("doc_id", "url")
    val norm = Urls.normalize(pages)
    val stats = Urls.domainStats(norm, Seq("bad.net").toDF("domain"))
      .orderBy("domain").collect()
    assert(stats.map(_.getString(0)).toSeq ==
      Seq("example.com", "sample.co.uk"))
    val ex = stats.find(_.getString(0) == "example.com").get
    assert(ex.getLong(1) == 3 && ex.getLong(2) == 2 && ex.getLong(3) == 5)
    val sc = stats.find(_.getString(0) == "sample.co.uk").get
    assert(sc.getLong(1) == 1 && sc.getLong(2) == 1 && sc.getLong(3) == 1)
  }
}
