package graft.operators

import graft.SparkSpec

/** Known-answer tests for token-budget sequence packing. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "s", "a b c"),    // shard 0, 3 tokens
    (1L, "s", "d e"),      // shard 1, 2 tokens
    (2L, "s", "f g h i"),  // shard 0, 4 tokens
    (3L, "s", "j"),        // shard 1, 1 token
    (4L, "s", "k l")       // shard 0, 2 tokens
  ).toDF("doc_id", "source", "text")

  test("chunk assignment follows start offsets within each shard stream") {
    val out = Packing.packByTokenBudget(docs, budget = 5, nShards = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(3), r.getLong(4))))
      .toMap
    // shard 0 stream: doc 0 starts at 0 → chunk 0; doc 2 starts at 3 →
    // chunk 0; doc 4 starts at 7 → chunk 1
    assert(out(0L) == ((0, 3L, 0L)))
    assert(out(2L) == ((0, 4L, 0L)))
    assert(out(4L) == ((0, 2L, 1L)))
    // shard 1 stream: doc 1 at 0, doc 3 at 2 → both chunk 0
    assert(out(1L) == ((1, 2L, 0L)))
    assert(out(3L) == ((1, 1L, 0L)))
  }

  test("packing partitions by the part column independently") {
    val two = Seq((0L, "a", "x y z"), (2L, "b", "p q r"))
      .toDF("doc_id", "source", "text")
    val out = Packing.packByTokenBudget(two, budget = 2, nShards = 1)
      .collect().map(r => (r.getString(1), r.getLong(4))).toSet
    // each source starts its own stream at offset 0 → both chunk 0
    assert(out == Set(("a", 0L), ("b", 0L)))
  }

  test("row count and token totals are conserved") {
    val out = Packing.packByTokenBudget(docs, budget = 3, nShards = 2)
    assert(out.count() == 5)
    assert(out.agg(org.apache.spark.sql.functions.sum("n_tok"))
      .head().getLong(0) == 12L)
  }
}
