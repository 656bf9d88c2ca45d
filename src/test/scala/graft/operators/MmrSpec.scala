package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Greedy MMR: known-answer selection, tie-breaking, redundancy penalty,
  * and the end-to-end diversified retrieval path.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("greedy selection trades relevance against redundancy") {
    // a and b are near-duplicates; plain top-2 would pick both. MMR picks
    // a then c: b's redundancy penalty (0.95 sim to a) sinks it.
    val cands = Seq((1L, 10L, 0.9), (1L, 11L, 0.85), (1L, 12L, 0.5))
      .toDF("query_id", "vec_id", "rel")
    val sims = Seq((1L, 10L, 11L, 0.95), (1L, 10L, 12L, 0.1),
      (1L, 11L, 12L, 0.1)).toDF("query_id", "a_id", "b_id", "sim")
    val got = Mmr.rerank(cands, sims, k = 2).orderBy("mmr_rank")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(10L, 12L))
    assert(got(0)._3 == 0.5 * 0.9)
    assert(got(1)._3 == 0.5 * 0.5 - 0.5 * 0.1)
  }

  test("ties break by ascending candidate id") {
    val cands = Seq((1L, 20L, 0.7), (1L, 7L, 0.7), (1L, 30L, 0.7))
      .toDF("query_id", "vec_id", "rel")
    val sims = Seq.empty[(Long, Long, Long, Double)]
      .toDF("query_id", "a_id", "b_id", "sim")
    val got = Mmr.rerank(cands, sims, k = 3).orderBy("mmr_rank")
      .collect().map(_.getLong(1)).toSeq
    // no sims recorded → pairSim 0 → pure relevance, id-ordered
    assert(got == Seq(7L, 20L, 30L))
  }

  test("k caps output; fewer candidates than k returns them all") {
    val cands = Seq((1L, 1L, 0.9), (1L, 2L, 0.8), (2L, 5L, 0.4))
      .toDF("query_id", "vec_id", "rel")
    val sims = Seq.empty[(Long, Long, Long, Double)]
      .toDF("query_id", "a_id", "b_id", "sim")
    val r = Mmr.rerank(cands, sims, k = 5).collect()
    assert(r.count(_.getLong(0) == 1L) == 2 && r.count(_.getLong(0) == 2L) == 1)
  }

  test("diversifiedTopK: lambda=1 reduces to plain top-k") {
    val corpus = (0L until 30L).map(i => (i,
      Array.tabulate(8)(j => ((i * 31 + j * 7) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val plain = Similarity.bruteForceTopK(corpus, queries, 4)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val mmr = Mmr.diversifiedTopK(corpus, queries, n = 4, k = 4, lambda = 1.0)
      .select("query_id", "vec_id", "mmr_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(mmr == plain)
  }
}
