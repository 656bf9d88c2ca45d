package graft.operators

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def clean(rows: Seq[(Long, String)], minDf: Long = 2) =
    Boilerplate.removeBoilerplate(rows.toDF("doc_id", "page"), minDf)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("shared header/footer dropped, unique bodies kept in order") {
    val r = clean(Seq(
      (1L, "NAV menu\nalpha content\nFOOTER c"),
      (2L, "NAV menu\nbeta content\nFOOTER c"),
      (3L, "NAV menu\ngamma one\ngamma two\nFOOTER c")))
    assert(r(1L) == (("alpha content", 3L, 1L)))
    assert(r(2L) == (("beta content", 3L, 1L)))
    assert(r(3L) == (("gamma one\ngamma two", 4L, 2L)))
  }

  test("fully-boilerplate page stays in output with empty clean text") {
    val r = clean(Seq(
      (1L, "NAV\nFOOTER"), (2L, "NAV\nFOOTER"), (3L, "NAV\nreal\nFOOTER")))
    assert(r(1L) == (("", 2L, 0L)))
    assert(r(3L) == (("real", 3L, 1L)))
  }

  test("duplicate line within one document does not count toward df") {
    // "echo" appears twice but only in doc 1 → df=1 → kept (both copies)
    val r = clean(Seq((1L, "echo\necho\nbody"), (2L, "other")))
    assert(r(1L) == (("echo\necho\nbody", 3L, 3L)))
  }

  test("minDf boundary: df = minDf-1 kept, df = minDf dropped") {
    val docs = Seq(
      (1L, "twice\nu1"), (2L, "twice\nu2"),
      (3L, "thrice\nu3"), (4L, "thrice\nu4"), (5L, "thrice\nu5"))
    val r = clean(docs, minDf = 3)
    assert(r(1L)._1 == "twice\nu1") // df=2 < 3 survives
    assert(r(3L)._1 == "u3")        // df=3 dropped
  }

  test("no-op on an all-unique corpus; deterministic under repartition") {
    val docs = (0L until 30L).map(i => (i, s"line a $i\nline b $i"))
    val a = clean(docs)
    assert(a.forall { case (i, (c, n, k)) =>
      c == s"line a $i\nline b $i" && n == 2 && k == 2 })
    val df = docs.toDF("doc_id", "page").repartition(7)
    val b = Boilerplate.removeBoilerplate(df, 2).orderBy("doc_id").collect()
    assert(b.map(_.toSeq).toSeq ==
      Boilerplate.removeBoilerplate(df.repartition(3), 2)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }

  test("synthesize: promo line only on every 3rd doc, 3-or-4-line pages") {
    val docs = Seq((0L, "body0", "s0"), (1L, "body1", "s1"))
      .toDF("doc_id", "text", "source")
    val pages = Boilerplate.synthesize(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pages(0L).split("\n").length == 4) // promo present
    assert(pages(1L).split("\n").length == 3)
    assert(pages(0L).contains("PROMO") && !pages(1L).contains("PROMO"))
  }
}
