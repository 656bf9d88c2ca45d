package graft.operators

import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import spark.implicits._
  import Validate._

  private val df = Seq(
    (1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, None, 30.0),
    (3L, Some("zz"), 99.0)).toDF("id", "cat", "v")

  private def report(checks: Seq[Check]) =
    Validate.run(df, checks).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getBoolean(2), r.getLong(3))).toMap

  test("each check counts its violations exactly") {
    val r = report(Seq(
      NotNull("cat"), Unique("id"), InRange("v", 0, 50),
      InSet("cat", Seq("a", "b")), Matches("cat", "^[ab]$"),
      RowCountBetween(1, 10)))
    assert(r(("not_null", "cat")) == ((false, 1L)))  // one null
    assert(r(("unique", "id")) == ((false, 1L)))     // one dup (3,3)
    assert(r(("in_range", "v")) == ((false, 1L)))    // 99.0
    assert(r(("in_set", "cat")) == ((false, 1L)))    // zz
    assert(r(("matches", "cat")) == ((false, 1L)))   // zz
    assert(r(("row_count", "*")) == ((true, 4L)))
  }

  test("clean data passes everything; row-count bounds enforced") {
    val clean = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "v")
    val r = Validate.run(clean, Seq(
        NotNull("cat"), Unique("id"), InRange("v", 0, 10),
        RowCountBetween(3, 10)))
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(r("not_null") && r("unique") && r("in_range"))
    assert(!r("row_count")) // only 2 rows, bound demands >= 3
  }

  test("null-only aggregate row is safe (empty input)") {
    val empty = Seq.empty[(Long, String, Double)].toDF("id", "cat", "v")
    val r = Validate.run(empty, Seq(InRange("v", 0, 1),
        RowCountBetween(0, 0)))
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(r("in_range") && r("row_count"))
  }
}
