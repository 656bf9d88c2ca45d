package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the step every web-crawl curation pipeline
  * runs first (WET-file generation): drop script/style/comment blocks,
  * strip tags, decode the core entities, collapse whitespace; surface
  * the title and the link count as structure signals. The whole pass is
  * a chain of codegen'd `regexp_replace`/`regexp_extract` expressions —
  * per-row, zero shuffles, stays inside WholeStageCodegen, so a 100 TB
  * HTML scan prices as one projection over the raw column.
  *
  * Every regex here is RE2-compatible (non-greedy, inline flags, no
  * backreferences) and the entity decode is a fixed literal-replace
  * order — which is what lets the DuckDB oracle replay the extraction
  * byte-for-byte on the same synthesized pages.
  */
object HtmlExtract {

  /** Tag/script/style/comment strip + entity decode + whitespace
    * collapse. Entity order is fixed (lt, gt, quot, #39, nbsp, amp
    * LAST — so "&amp;lt;" decodes to the literal "&lt;", not "<").
    */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (ent, ch)) =>
        regexp_replace(acc, ent, ch) } // entities hold no regex metachars
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** First <title> content (empty string when absent). */
  def htmlTitle(c: Column): Column =
    regexp_extract(c, "(?is)<title>(.*?)</title>", 1)

  /** Number of anchor tags — the in/out-link structure signal link-graph
    * builders consume. */
  def htmlLinkCount(c: Column): Column =
    size(regexp_extract_all(c, lit("(?is)<a\\s"), lit(0)))

  /** Deterministic page synthesis for testing: wraps each doc's text in
    * a fixed boilerplate template (head/style/script, nav links, an
    * entity-bearing paragraph, footer) reproducible as string
    * concatenation in SQL — the oracle builds the same bytes.
    */
  def synthesize(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val id = col(idCol).cast("string")
    docs.withColumn("html", concat(
      lit("<html><head><title>Doc "), id,
      lit("</title><style>body { color: #333; }</style><script>var id="),
      id,
      lit(";</script></head><body><nav><a href=\"/\">home</a> | " +
        "<a href=\"/about\">about</a></nav><!-- boilerplate --><h1>Doc "),
      id,
      lit("</h1><p>Q&amp;A &lt;tag&gt; &quot;q&quot; it&#39;s " +
        "x&nbsp;y</p><p>"),
      col(textCol),
      lit("</p><footer>&copy; example</footer></body></html>")))
  }

  /** Deterministic LINKED page synthesis: like [[synthesize]] but each
    * page carries two internal links to other documents (targets
    * `(id·7 + c) mod n` for c = 1, 2 — the [[LinkGraph.syntheticLinks]]
    * wiring, now travelling as real `<a href>` markup) and every 13th
    * page a `<meta name="robots" content="noindex">` directive — the
    * two inputs a crawl-graph builder actually parses out of HTML.
    */
  def synthesizeLinked(docs: DataFrame, idCol: String = "doc_id")
      : DataFrame = {
    val id = col(idCol).cast("long")
    val n = docs.select(count(lit(1)).as("__n"))
    docs.crossJoin(broadcast(n)).withColumn("html", concat(
      lit("<html><head><title>Doc "), id.cast("string"),
      lit("</title>"),
      when(pmod(id, lit(13)) === 0,
        lit("<meta name=\"robots\" content=\"noindex\">"))
        .otherwise(lit("")),
      lit("</head><body><p>page body</p><a href=\"/doc/"),
      pmod(id * 7 + 1, col("__n")).cast("string"),
      lit("\">next</a> <a href=\"/doc/"),
      pmod(id * 7 + 2, col("__n")).cast("string"),
      lit("\">more</a></body></html>"))).drop("__n")
  }

  /** Out-link edge extraction — the crawl-graph construction step
    * between WET generation and [[LinkGraph]]: every internal
    * `href="/doc/N"` becomes an edge row (src, dst), with the source
    * page's `noindex` directive surfaced so the graph builder can
    * respect robots metadata. Pure regexp projection + one explode —
    * zero shuffles; the edge table feeds pageRank/bfsDepth directly.
    */
  def extractLinks(pages: DataFrame, idCol: String = "doc_id",
                   htmlCol: String = "html"): DataFrame =
    pages.select(col(idCol).cast("long").as("src"),
        regexp_extract_all(col(htmlCol),
          lit("href=\"/doc/([0-9]+)\""), lit(1)).as("__t"),
        regexp_extract(col(htmlCol),
          "(?i)<meta name=\"robots\" content=\"noindex\">", 0)
          .notEqual("").as("src_noindex"))
      .select(col("src"), explode(col("__t")).as("__d"),
        col("src_noindex"))
      .select(col("src"), col("__d").cast("long").as("dst"),
        col("src_noindex"))

  /** Full extraction: (idCol, title, n_links, text_clean). */
  def extract(pages: DataFrame, idCol: String = "doc_id",
              htmlCol: String = "html"): DataFrame =
    pages.select(col(idCol),
      htmlTitle(col(htmlCol)).as("title"),
      htmlLinkCount(col(htmlCol)).as("n_links"),
      stripHtml(col(htmlCol)).as("text_clean"))
}
