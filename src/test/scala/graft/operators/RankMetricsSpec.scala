package graft.operators

import graft.SparkSpec

/** Retrieval metrics: hand-computed overlap cases, queries with zero hits
  * still appear, and recall@k of SRP against brute force on a real corpus
  * is high (the evaluation loop the operator exists to close).
  */
class RankMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def rs(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "vec_id", "rank")

  test("hand-computed overlap: hits, recall_pct, first_hit_rank") {
    val exact = rs((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3))
    // q1: approx finds 11 (rank2) and 12 (rank3), misses 10;
    // q2: approx finds nothing true
    val approx = rs((1L, 99L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 98L, 1), (2L, 97L, 2), (2L, 96L, 3))
    val out = RankMetrics.topKOverlap(exact, approx, k = 3)
      .orderBy("query_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ==
      Seq((1L, 2L, 66L, 2L), (2L, 0L, 0L, -1L)))
  }

  test("perfect agreement gives recall 100 and first_hit_rank 1") {
    val x = rs((7L, 1L, 1), (7L, 2L, 2))
    val out = RankMetrics.topKOverlap(x, x, k = 2).head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) == (2L, 100L, 1L))
  }

  test("pairSetMetrics: hand-computed tp/fp/fn and empty-side sentinels") {
    def pairs(rows: (Long, Long)*) = rows.toDF("a_id", "b_id")
    // predicted {12,13,14}, truth {12,14,15,16} -> tp=2 fp=1 fn=2
    val out = RankMetrics.pairSetMetrics(
      pairs((1L, 2L), (1L, 3L), (1L, 4L)),
      pairs((1L, 2L), (1L, 4L), (1L, 5L), (1L, 6L))).head
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3), out.getLong(4)) == (2L, 1L, 2L, 66L, 50L))
    // duplicates in an input collapse before counting
    val dup = RankMetrics.pairSetMetrics(
      pairs((1L, 2L), (1L, 2L)), pairs((1L, 2L))).head
    assert((dup.getLong(0), dup.getLong(1), dup.getLong(2)) == (1L, 0L, 0L))
    // empty predicted: precision undefined -> -1, recall 0
    val ep = RankMetrics.pairSetMetrics(pairs(), pairs((1L, 2L))).head
    assert((ep.getLong(0), ep.getLong(2), ep.getLong(3), ep.getLong(4)) ==
      (0L, 1L, -1L, 0L))
    // both empty: all sentinels
    val bb = RankMetrics.pairSetMetrics(pairs(), pairs()).head
    assert((bb.getLong(0), bb.getLong(3), bb.getLong(4)) == (0L, -1L, -1L))
  }

  test("SRP recall against brute force on a synthetic corpus is high") {
    val rnd = new scala.util.Random(7)
    // clustered corpus (the regime ANN indexes exist for): 10 well-
    // separated centers, small within-cluster noise
    val centers = Array.fill(10)(Array.fill(16)(rnd.nextGaussian()))
    val emb = (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
    val approx = Similarity.srpTopK(emb, q, k = 5, nBits = 8)
    val out = RankMetrics.topKOverlap(exact, approx, k = 5).collect()
    assert(out.length == 8)
    // every query's top-1 exact neighbor is itself (cos=1), and SRP
    // multi-probe always retains the query's own bucket => >= 1 hit
    out.foreach(r => assert(r.getLong(1) >= 1,
      s"query ${r.getLong(0)} had no hits"))
    val mean = out.map(_.getLong(2)).sum / out.length.toDouble
    assert(mean >= 50.0, s"mean recall_pct $mean")
  }
}
