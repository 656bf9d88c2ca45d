package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  test("rankArm rounds before ranking and cuts at topN") {
    // 1e-9 apart -> identical at 6 dp -> tie breaks to min id, NOT to
    // the raw-score order (id 9 has the higher raw score)
    val scored = Seq(
      (0, 9L, 0.5000000009), (0, 2L, 0.5000000001),
      (0, 5L, 0.9), (0, 7L, 0.1))
      .toDF("query_id", "id", "score")
    val r = HybridSearch.rankArm(scored, topN = 3)
      .orderBy("rank").collect()
      .map(x => (x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq((5L, 1L), (2L, 2L), (9L, 3L)))
  }

  test("rrfFuse: integer contributions, absent arm contributes zero") {
    val lex = Seq((0, 10L, 1L), (0, 11L, 2L)).toDF("query_id", "id", "rank")
    val sem = Seq((0, 11L, 1L), (0, 12L, 2L)).toDF("query_id", "id", "rank")
    val f = HybridSearch.rrfFuse(lex, sem, rrfK = 60)
      .orderBy(col("rrf").desc, col("id")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // 10^9 div 61 = 16393442, div 62 = 16129032
    assert(f.toSeq === Seq(
      (11L, 2L, 1L, 16129032L + 16393442L),
      (10L, 1L, 0L, 16393442L),
      (12L, 0L, 2L, 16129032L)))
  }

  test("boundedRankArm matches rankArm's contract with no Window node") {
    val scored = Seq(
      (0, 9L, 0.5000000009), (0, 2L, 0.5000000001),
      (0, 5L, 0.9), (0, 7L, 0.1),
      (1, 3L, 0.2), (1, 4L, 0.8))
      .toDF("query_id", "id", "score")
    val bounded = HybridSearch.boundedRankArm(scored, topN = 3)
    // same (query_id, id, rank) rows as the window form
    assert(bounded.orderBy("query_id", "rank").collect().toSeq ===
      HybridSearch.rankArm(scored, topN = 3)
        .orderBy("query_id", "rank").collect().toSeq)
    // the dense arm's plan must carry NO per-query window funnel:
    // top-N lives in a map-side-combinable ObjectHashAggregate
    val plan = bounded.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("graft_topk"), plan)
  }

  test("end-to-end fusion deterministic under repartition") {
    val docs = spark.range(0, 120).select(col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 12).map(i =>
          element_at(typedLit(Seq("spark", "join", "hash", "sort",
            "window", "scan", "merge", "batch")),
            (pmod(xxhash64(col("id") * 31 + i), lit(8)) + 1).cast("int"))): _*)
        .as("text"))
    val posts = InvertedIndex.postingsWithLen(docs)
    val stats = InvertedIndex.bm25Stats(posts)
    val qs = Seq(0 -> Seq("spark", "hash"), 1 -> Seq("join", "merge"))
    val emb = spark.range(0, 120).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(8)),
        j => (pmod(xxhash64(col("id") * 8 + j), lit(1000)).cast("double")
          / 1000.0 - 0.5).cast("float")).as("embedding"))
    val q = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").cast("int").as("query_id"),
        col("embedding").as("qvec"))
    def run(p: Int) = {
      val d2 = if (p == 0) docs else docs.repartition(p)
      val e2 = if (p == 0) emb else emb.repartition(p)
      val po = InvertedIndex.postingsWithLen(d2)
      HybridSearch.rrfFuse(
          HybridSearch.lexicalArm(po, InvertedIndex.bm25Stats(po), qs, 20),
          HybridSearch.cosineArm(e2, q, 20))
        .orderBy(col("query_id"), col("rrf").desc, col("id"))
        .collect().toSeq
    }
    val a = run(0); val b = run(7)
    assert(a === b)
    assert(a.nonEmpty)
    // every fused row carries at least one live rank
    assert(a.forall(r => r.getLong(2) > 0 || r.getLong(3) > 0))
  }
}
