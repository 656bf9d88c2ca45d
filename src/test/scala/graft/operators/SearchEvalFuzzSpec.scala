package graft.operators

import graft.SparkSpec

/** Differential fuzz for [[SearchEval.rankingMetrics]] the way
  * MvRewriteFuzzSpec covers the rewrite rule: seeded random ranked runs
  * and graded qrels, replayed against a plain-Scala BigInt reference of
  * the DOCUMENTED definition (integer weight table, full-qrels IDCG with
  * doc_id ties, lcm-scaled AP with min(R,k) denominator, floor
  * divisions — all arithmetic exact, so expected values are equality-
  * checkable, not tolerance-checkable). Shapes exercised per iteration:
  * graded and binary relevance, judged-but-irrelevant rows (rel = 0),
  * queries with no qrels at all, rank gaps from upstream filtering,
  * ranks past k, and k ∈ {1, 3, 10, 20}.
  */
class SearchEvalFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def reference(results: Seq[(Long, String, Int)],
                        qrels: Seq[(Long, String, Long)], k: Int)
      : Map[Long, (Long, Long, Long, Long)] = {
    val w = SearchEval.discountWeightsU(k)
    val L = SearchEval.lcmTo(k)
    val rel = qrels.map(q => (q._1, q._2) -> q._3).toMap
    results.groupBy(_._1).flatMap { case (qid, rs) =>
      val inK = rs.filter(_._3 <= k).sortBy(_._3)
      if (inK.isEmpty) None
      else {
        val graded = inK.map(r => (r._3, rel.getOrElse((qid, r._2), 0L)))
        val dcg = graded.map { case (r, g) => BigInt(g) * w(r - 1) }.sum
        val judged = qrels.filter(q => q._1 == qid && q._3 > 0)
        val idcg = judged.sortBy(q => (-q._3, q._2)).take(k).zipWithIndex
          .map { case (q, i) => BigInt(q._3) * w(i) }.sum
        val hits = graded.count(_._2 > 0)
        val firstRel = graded.collectFirst { case (r, g) if g > 0 => r }
        var cum = 0
        var apNum = BigInt(0)
        graded.foreach { case (r, g) =>
          if (g > 0) { cum += 1; apNum += BigInt(cum) * (L / r) }
        }
        val ndcg = if (idcg > 0) BigInt(1000000000) * dcg / idcg
                   else BigInt(0)
        val mrr = firstRel.map(1000000L / _).getOrElse(0L)
        val p = hits.toLong * 1000000L / k
        val ap = if (judged.nonEmpty)
          BigInt(1000000) * apNum /
            (BigInt(L) * BigInt(math.min(judged.size, k)))
        else BigInt(0)
        Some(qid -> (ndcg.toLong, mrr, p, ap.toLong))
      }
    }
  }

  test("seeded random runs match the BigInt reference exactly") {
    val rnd = new scala.util.Random(2026)
    val ks = Seq(1, 3, 10, 20)
    (1 to 20).foreach { i =>
      val k = ks(rnd.nextInt(ks.size))
      val docs = (0 until 30).map(d => s"d$d")
      val nQ = 2 + rnd.nextInt(3)
      val results = (0L until nQ).flatMap { qid =>
        val n = 1 + rnd.nextInt(k + 5)
        val ranked = rnd.shuffle(docs).take(n).zipWithIndex
          .map { case (d, r) => (qid, d, r + 1) }
        // random upstream filtering leaves RANK GAPS — the window's
        // cumulative hits must follow rank order, not row adjacency
        ranked.filter(_ => rnd.nextInt(5) > 0)
      }
      val qrels = (0L until nQ).flatMap { qid =>
        if (qid == 0 && rnd.nextBoolean()) Nil // a query with NO qrels
        else rnd.shuffle(docs).take(1 + rnd.nextInt(12)).map(d =>
          (qid, d, rnd.nextInt(4).toLong)) // rel 0 rows stay judged-only
      }
      val got = SearchEval.rankingMetrics(
          results.toDF("query_id", "doc_id", "rank"),
          qrels.toDF("query_id", "doc_id", "rel"), k)
        .collect().map(r => r.getAs[Long]("query_id") ->
          (r.getAs[Long]("ndcg_u"), r.getAs[Long]("mrr_u"),
            r.getAs[Long]("p_at_k_u"), r.getAs[Long]("ap_u"))).toMap
      assert(got === reference(results, qrels, k),
        s"iteration $i (k=$k) diverged\nresults=$results\nqrels=$qrels")
    }
  }
}
