package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Known-answer tests for the Gopher-style repetition metrics. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a a a a"),        // degenerate repeat
    (2L, "a b c d"),        // all distinct
    (3L, ""),               // empty
    (4L, "x y"),            // shorter than 3-gram
    (5L, "Spam  SPAM spam eggs") // case/ws normalization: 3× "spam"
  ).toDF("doc_id", "text")

  private def row(id: Long) = Repetition.metrics(docs)
    .filter(col("doc_id") === id).collect().head

  test("degenerate repeats: overlapping grams counted, frac may exceed 1") {
    val r = row(1L)
    assert(r.getInt(1) == 4)            // n_tokens
    assert(r.getDouble(2) == 0.25)      // distinct_frac
    assert(r.getDouble(3) == 1.5)       // "a a" ×3 ×2 / 4
    assert(r.getDouble(4) == 1.5)       // "a a a" ×2 ×3 / 4
  }

  test("all-distinct doc: every gram unique") {
    val r = row(2L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.5 &&
      r.getDouble(4) == 0.75)
  }

  test("empty doc: distinct_frac 1.0, gram fracs 0.0") {
    val r = row(3L)
    assert(r.getInt(1) == 0 && r.getDouble(2) == 1.0 &&
      r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
  }

  test("doc shorter than the gram: frac 0.0 for that size") {
    val r = row(4L)
    assert(r.getDouble(3) == 1.0) // "x y" ×1 ×2 / 2
    assert(r.getDouble(4) == 0.0)
  }

  test("metrics normalize case and whitespace first") {
    val r = row(5L)
    assert(r.getInt(1) == 4 && r.getDouble(2) == 0.5) // {spam, eggs} / 4
  }

  test("keep gate drops repetition-dominated docs only") {
    val kept = Repetition.keep(docs,
        minDistinctFrac = 0.3, maxTop2Frac = 1.0, maxTop3Frac = 0.8)
      .select("doc_id").as[Long].collect().sorted
    // 1 fails distinct_frac+top fracs; 4's top2 1.0 passes ≤; 5 passes
    assert(kept.toSeq == Seq(2L, 3L, 4L, 5L))
  }
}
