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

  test("length-bucketed batches: hand-computed buckets and padding") {
    // lens 5,10,16 → bucket 0; 17,20 → bucket 1 (width 16)
    val d = Seq((0L, 5), (1L, 10), (2L, 16), (3L, 17), (4L, 20))
      .map { case (i, n) => (i, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val out = Packing
      .lengthBucketedBatches(d, bucketWidth = 16, batchSize = 2)
      .orderBy("bucket", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L, 16L, 26L, 6L),  // [16,10] padded to 16
      (0L, 1L, 1L, 5L, 5L, 0L),    // [5] alone pads nothing
      (1L, 0L, 2L, 20L, 37L, 3L))) // [20,17] padded to 20
  }

  test("length-bucketed batches: size cap, within-bucket spread bound, " +
       "determinism") {
    val d = (0L until 300L).map(i =>
      (i, Seq.fill((i % 53 + 1).toInt)("t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing
      .lengthBucketedBatches(d, bucketWidth = 8, batchSize = 4)
    val rows = out.collect()
    // every batch ≤ batchSize docs; padding < n_docs × bucketWidth
    // (members of one bucket differ by < width)
    assert(rows.forall(_.getLong(2) <= 4L))
    assert(rows.forall(r => r.getLong(5) < r.getLong(2) * 8L))
    // doc conservation + determinism under repartition
    assert(rows.map(_.getLong(2)).sum == 300L)
    val again = Packing.lengthBucketedBatches(d.repartition(7),
      bucketWidth = 8, batchSize = 4)
      .orderBy("bucket", "batch_id").collect().map(_.toSeq).toSeq
    assert(out.orderBy("bucket", "batch_id").collect()
      .map(_.toSeq).toSeq == again)
  }
}
