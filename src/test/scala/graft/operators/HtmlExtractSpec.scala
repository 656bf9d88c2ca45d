package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String = {
    val df = Seq(html).toDF("h")
    df.select(HtmlExtract.stripHtml(col("h"))).head.getString(0)
  }

  test("known-answer strip: blocks, tags, entities, whitespace") {
    val html = "<html><head><style>p {x}</style>" +
      "<script>if (1<2) alert('hi');</script></head>" +
      "<body><!-- c --><h1>Title</h1>\n<p>A &amp; B &lt;ok&gt;</p></body>"
    assert(strip(html) == "Title A & B <ok>")
  }

  test("plain text passes through modulo whitespace collapse") {
    assert(strip("  hello   world ") == "hello world")
    assert(strip("no markup here.") == "no markup here.")
  }

  test("entity order: &amp;lt; decodes to literal entity text, not <") {
    // amp decoded LAST: "&amp;lt;" -> "&lt;" (the text the author wrote)
    assert(strip("<p>&amp;lt;</p>") == "&lt;")
  }

  test("script with markup inside is dropped wholesale") {
    assert(strip("a<script>document.write('<b>x</b>')</script>b") == "a b")
  }

  test("title and link count extract") {
    val df = Seq("<html><head><title>My Page</title></head>" +
        "<body><a href=\"/x\">x</a><a\nhref=\"/y\">y</a><p>no</p></body>")
      .toDF("h")
    val r = df.select(HtmlExtract.htmlTitle(col("h")),
      HtmlExtract.htmlLinkCount(col("h"))).head
    assert(r.getString(0) == "My Page" && r.getInt(1) == 2)
  }

  test("synthesize → extract round-trips the document text") {
    val docs = Seq((1L, "original body text"), (2L, "second doc"))
      .toDF("doc_id", "text")
    val out = HtmlExtract.extract(HtmlExtract.synthesize(docs))
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("Doc 1", "Doc 2"))
    assert(out.forall(_.getInt(2) == 2)) // the two nav links
    // body text survives, boilerplate (nav/footer/script/style) is gone,
    // the entity paragraph decodes
    val t1 = out.head.getString(3)
    assert(t1.contains("original body text"))
    assert(t1.contains("Q&A <tag> \"q\" it's x y"))
    assert(!t1.contains("color") && !t1.contains("var id"))
    assert(t1.contains("home | about")) // nav TEXT stays; tags go
  }

  test("extractLinks: every internal href becomes an edge, noindex " +
       "surfaces, external/malformed hrefs ignored") {
    import spark.implicits._
    val pages = Seq(
      (0L, """<a href="/doc/5">x</a><a href="/doc/7">y</a>"""),
      (13L, """<meta name="robots" content="noindex">""" +
        """<a href="/doc/1">z</a>"""),
      (2L, """<a href="http://ext.example.com/doc/9">e</a>""" +
        """<a href="/doc/abc">bad</a>""")).toDF("doc_id", "html")
    val got = HtmlExtract.extractLinks(pages)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(got == Set((0L, 5L, false), (0L, 7L, false), (13L, 1L, true)))
  }

  test("synthesizeLinked wiring matches LinkGraph.syntheticLinks' " +
       "k=2 mult=7 edge set") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val viaHtml = HtmlExtract
      .extractLinks(HtmlExtract.synthesizeLinked(docs))
      .select("src", "dst")
    val direct = LinkGraph.syntheticLinks(docs, k = 2, mult = 7L)
    assert(viaHtml.except(direct).count() == 0 &&
      direct.except(viaHtml).count() == 0)
    // parsing real markup and the closed-form generator agree — the
    // crawl-graph construction step is lossless
  }
}
