package graft.operators

import graft.SparkSpec

class SearchEvalSpec extends SparkSpec {
  import spark.implicits._

  test("discount weights: rank 1 is exactly 1e6, strictly decreasing") {
    val w = SearchEval.discountWeightsU(10)
    assert(w.head === 1000000L)
    assert(w === w.sorted(Ordering[Long].reverse))
    assert(w(1) === 630930L) // round(1e6 / log2(3)) = round(630929.75…)
    assert(w(2) === 500000L) // 1e6 / log2(4) exactly
    assert(SearchEval.lcmTo(10) === 2520L)
    assert(SearchEval.lcmTo(20) === 232792560L)
  }

  test("perfect ranking: ndcg_u = 1e9 exactly, mrr_u = 1e6") {
    val res = Seq((0L, "a", 1), (0L, "b", 2), (0L, "c", 3))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((0L, "a", 3L), (0L, "b", 2L), (0L, "c", 1L))
      .toDF("query_id", "doc_id", "rel")
    val m = SearchEval.rankingMetrics(res, qrels, 10).collect().head
    assert(m.getAs[Long]("ndcg_u") === 1000000000L)
    assert(m.getAs[Long]("mrr_u") === 1000000L)
    assert(m.getAs[Long]("p_at_k_u") === 300000L)
    assert(m.getAs[Long]("ap_u") === 1000000L) // every precision@i = 1
  }

  test("hand case: misrank + junk hit + unretrieved relevant doc") {
    // qrels a:3, c:1, d:2; retrieved [a, b(junk), c] — ideal is [a, d, c]
    val res = Seq((7L, "a", 1), (7L, "b", 2), (7L, "c", 3))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((7L, "a", 3L), (7L, "c", 1L), (7L, "d", 2L))
      .toDF("query_id", "doc_id", "rel")
    val w = SearchEval.discountWeightsU(10)
    val dcg = BigInt(3) * w(0) + BigInt(0) * w(1) + BigInt(1) * w(2)
    val idcg = BigInt(3) * w(0) + BigInt(2) * w(1) + BigInt(1) * w(2)
    val m = SearchEval.rankingMetrics(res, qrels, 10).collect().head
    assert(m.getAs[Long]("ndcg_u") ===
      (BigInt(1000000000) * dcg / idcg).toLong)
    assert(m.getAs[Long]("mrr_u") === 1000000L)
    assert(m.getAs[Long]("p_at_k_u") === 200000L)
    // AP: hits@1 = 1 (term 2520), hits@3 = 2 (term 2*840); R = 3
    val apNum = BigInt(1) * 2520 + BigInt(2) * (2520 / 3)
    assert(m.getAs[Long]("ap_u") ===
      (BigInt(1000000) * apNum / (2520 * 3)).toLong) // = 555555
  }

  test("no relevant retrieved: a zero row, not a missing row") {
    val res = Seq((1L, "x", 1)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, "y", 2L)).toDF("query_id", "doc_id", "rel")
    val m = SearchEval.rankingMetrics(res, qrels, 10).collect()
    assert(m.length === 1)
    assert(m.head.getAs[Long]("ndcg_u") === 0L)
    assert(m.head.getAs[Long]("mrr_u") === 0L)
    assert(m.head.getAs[Long]("p_at_k_u") === 0L)
    assert(m.head.getAs[Long]("ap_u") === 0L)
  }

  test("rank > k rows are ignored in DCG but count toward the ideal; " +
      "partitioning does not change the result") {
    val res = Seq((0L, "a", 1), (0L, "z", 11))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((0L, "a", 1L), (0L, "z", 3L))
      .toDF("query_id", "doc_id", "rel")
    val w = SearchEval.discountWeightsU(10)
    val dcg = BigInt(1) * w(0)
    val idcg = BigInt(3) * w(0) + BigInt(1) * w(1)
    val one = SearchEval.rankingMetrics(res, qrels, 10).collect().head
    assert(one.getAs[Long]("ndcg_u") ===
      (BigInt(1000000000) * dcg / idcg).toLong)
    // AP: only a was retrieved in-window (hits@1 = 1), but BOTH judged
    // docs count toward R — the unretrieved relevant doc halves AP
    assert(one.getAs[Long]("ap_u") ===
      (BigInt(1000000) * 2520 / (2520 * 2)).toLong) // = 500000
    val many = SearchEval.rankingMetrics(
      res.repartition(7), qrels.repartition(5), 10).collect().head
    assert(one === many)
  }
}
