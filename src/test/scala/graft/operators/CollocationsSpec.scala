package graft.operators

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("known corpus: confidence is exact ppm of P(w2 | w1)") {
    val docs = Seq(
      "new york is big. new york is old",
      "a new day in new york").toDF("text")
    // "new" occurs 4 times; "new york" 3 times; "new day" 1 time
    val out = Collocations
      .topByConfidence(docs, minCount = 1L, k = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("new", "york")) == (3L, 4L, 750000L))
    assert(out(("new", "day")) == (1L, 4L, 250000L))
    // "is" -> "big"/"old": conf 500000 each from c1("is") = 2
    assert(out(("is", "big")) == (1L, 2L, 500000L))
  }

  test("minCount gates pairs; ordering is (conf desc, w1, w2)") {
    val docs = Seq(
      "x y x y x y x y x y",  // (x,y)*5 and (y,x)*4
      "p q").toDF("text")
    val rows = Collocations.topByConfidence(docs, minCount = 4L, k = 10)
      .collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("x", "y"), ("y", "x")))
    // x appears 5 times, all followed by y -> 1e6 exactly
    assert(rows.head.getLong(4) == 1000000L)
  }

  test("tokenization lowercases and splits on non-alphanumerics; " +
       "deterministic under repartition") {
    val docs = Seq("Foo-BAR!! foo bar?", "foo bar").toDF("text")
    val a = Collocations.topByConfidence(docs, minCount = 1L, k = 10)
      .collect().map(_.toSeq).toSeq
    val b = Collocations
      .topByConfidence(docs.repartition(5), minCount = 1L, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    // every "foo" is followed by "bar" whatever the case/punctuation
    assert(a.head(0) == "foo" && a.head(1) == "bar" &&
      a.head(4) == 1000000L)
  }

  test("single-token and empty docs contribute no pairs and no errors") {
    val docs = Seq("solo", "", "  ", "a b").toDF("text")
    val rows = Collocations.topByConfidence(docs, minCount = 1L, k = 10)
      .collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b")))
  }
}
