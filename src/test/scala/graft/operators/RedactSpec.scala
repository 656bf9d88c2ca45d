package graft.operators

import graft.SparkSpec

/** Known-answer tests for PII redaction. */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "mail me at jo.doe+x@corp.example.org today"),
    (2L, "server 10.0.255.7 then 192.168.1.1 again"),
    (3L, "call +1 415-555-2671 or +44 020-794-60958"),
    (4L, "ssn 078-05-1120 on file"),
    (5L, "nothing sensitive here"),
    (6L, "combo a@b.co 1.2.3.4 078-05-1120")
  ).toDF("doc_id", "text")

  private lazy val out = Redact.scrub(docs).collect()
    .map(r => r.getLong(0) ->
      ((r.getString(6), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))))
    .toMap

  test("each rule redacts and counts its own PII class") {
    assert(out(1L)._1 == "mail me at <EMAIL> today")
    assert(out(1L)._2 == 1)
    assert(out(2L)._1 == "server <IP> then <IP> again")
    assert(out(2L)._3 == 2)
    assert(out(3L)._1 == "call <PHONE> or +44 020-794-60958")
    assert(out(3L)._4 == 1) // second number: 5-digit tail ⇒ not phone-shaped
    assert(out(4L)._1 == "ssn <SSN> on file")
    assert(out(4L)._5 == 1)
  }

  test("clean text passes through untouched with zero counts") {
    assert(out(5L) == (("nothing sensitive here", 0, 0, 0, 0)))
  }

  test("mixed PII classes redact independently in one pass") {
    assert(out(6L)._1 == "combo <EMAIL> <IP> <SSN>")
    assert((out(6L)._2, out(6L)._3, out(6L)._5) == ((1, 1, 1)))
  }

  test("clean() keeps only rows with no PII at all") {
    val kept = Redact.clean(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(5L))
    assert(Redact.clean(docs).columns.toSeq == Seq("doc_id", "text"))
  }

  test("placeholders never create matches for later rules") {
    // an email whose redaction leaves ip-like neighbours intact
    val t = Seq((9L, "x 1.2.3.4@e.io 5.6.7.8")).toDF("doc_id", "text")
    val r = Redact.scrub(t).collect().head
    assert(r.getString(6) == "x <EMAIL> <IP>")
  }
}
