package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DatasetCardSpec extends SparkSpec {
  import spark.implicits._

  test("hand corpus: counts, dups, scaled means, ppm rates") {
    val docs = Seq(
      ("a", "one two three"),           // 3 tokens
      ("a", "one two three"),           // exact dup of the above
      ("a", Seq.fill(64)("w").mkString(" ")), // long doc
      ("b", "solo")).toDF("source", "text")
    val out = DatasetCard.perSource(docs, lit(1.0))
      .orderBy("source").collect()
    val a = out(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 3L)
    assert(a.getLong(2) == 3L + 3L + 64L)
    assert(a.getLong(3) == 1L)                 // one duplicated doc
    assert(a.getLong(4) == 70L * 100L / 3L)    // floor(7000/3) = 2333
    assert(a.getLong(5) == 1000000L / 3L)      // 1 of 3 long
    assert(a.getLong(6) == 1000000L)           // margin 1.0 ≥ 0 always
    val b = out(1)
    assert(b.getString(0) == "b" && b.getLong(1) == 1L &&
      b.getLong(3) == 0L)
  }

  test("one aggregation exchange produces the whole card") {
    val docs = (0L until 500L).map(i => (s"s${i % 4}", s"d $i t"))
      .toDF("source", "text")
    val card = DatasetCard.perSource(docs, lit(0.5))
    val plan = card.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"card must not join:\n$plan")
    assert(card.count() == 4)
  }

  test("negative margins count as dropped in quality_keep_ppm") {
    val docs = Seq(("s", "a b"), ("s", "c d e f")).toDF("source", "text")
    // margin = n_chars parity trick: keep only the 4-token doc
    val out = DatasetCard.perSource(docs,
      when(length(col("text")) > 5, lit(1.0)).otherwise(lit(-1.0)))
      .collect().head
    assert(out.getLong(6) == 500000L)
  }
}
