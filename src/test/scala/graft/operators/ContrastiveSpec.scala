package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: floor-half split, short docs gated") {
    val docs = Seq(
      (1L, "a b c d e f g h i"),   // 9 toks: anchor 4, positive 5
      (2L, "one  two   three"))    // 3 toks < minToks: dropped
      .toDF("doc_id", "text")
    val r = Contrastive.spanPairs(docs, minToks = 8, batches = 4)
      .collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("anchor") === "a b c d")
    assert(r.head.getAs[String]("positive") === "e f g h i")
    assert(r.head.getAs[Long]("n_negatives") === 0L)
  }

  test("pairs are lossless and batch accounting is exact") {
    val docs = spark.range(0, 300).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 11).map(i =>
        concat(lit("w"), pmod(xxhash64(col("id") * 13 + i), lit(50)))): _*)
        .as("text"))
    val pairs = Contrastive.spanPairs(docs, minToks = 8, batches = 16)
      .localCheckpoint()
    // anchor ++ positive recovers the token stream exactly
    val broken = pairs
      .join(docs, "doc_id")
      .filter(concat_ws(" ", col("anchor"), col("positive")) =!=
        array_join(filter(split(col("text"), "\\s+"), t => t =!= ""), " "))
      .count()
    assert(broken === 0L)
    // n_negatives + 1 sums to the batch size for every batch
    val bad = pairs.groupBy("batch_id")
      .agg(count(lit(1)).as("n"), max("n_negatives").as("mx"),
        min("n_negatives").as("mn"))
      .filter(col("mx") =!= col("n") - 1 || col("mn") =!= col("n") - 1)
      .count()
    assert(bad === 0L)
    // deterministic under repartition
    val a = pairs.orderBy("doc_id").collect().toSeq
    val b = Contrastive.spanPairs(docs.repartition(7), minToks = 8,
        batches = 16)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
