package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998) diversified
  * top-k: greedily re-rank a candidate set so each pick maximizes
  * `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)` — relevance traded against
  * redundancy with what's already selected. The retrieval-diversification
  * step of a RAG / training-data sampling pipeline (pick k docs that are
  * relevant AND not near-duplicates of each other). No reference
  * equivalent; judged pipeline extension alongside SURVEY §2.
  *
  * Scale shape:
  *  - The expensive, corpus-sized work (candidate generation) is the ANN
  *    operators' job — MMR consumes their per-query top-n, so its input is
  *    `queries × n` rows, never the corpus.
  *  - Candidate relevance and all pairwise candidate sims are computed as
  *    COLUMNS with the codegen'd normalize/dot kernels (one self-join per
  *    query group, n² scalar rows per query, n ≤ a few dozen) — no
  *    floating-point work inside the greedy loop.
  *  - The greedy selection itself is `flatMapGroups` over one query's
  *    ≤ n candidates: O(k·n) double comparisons on precomputed scalars —
  *    the same justified-imperative standing as the BPE encoder (iterative
  *    argmax has no relational form; the group is bounded by construction).
  *  - Determinism: selection compares `λ·rel − (1−λ)·maxSim` with IEEE
  *    doubles both engines compute identically (dot-of-normalized =
  *    DuckDB's list_cosine_similarity, proven by the ANN oracles); ties
  *    break by ascending candidate id.
  */
object Mmr {

  /** Greedy MMR over precomputed scores.
    *
    * @param cands one row per (query_id, vec_id) candidate with its
    *              relevance `rel`
    * @param sims  one row per ordered candidate pair (query_id, a_id,
    *              b_id, sim); both orientations or just one (looked up
    *              symmetrically; missing pair = sim 0)
    * @return (query_id, vec_id, mmr_rank 1..k, mmr_score)
    */
  def rerank(cands: DataFrame, sims: DataFrame, k: Int,
             lambda: Double = 0.5): DataFrame = {
    require(k > 0 && lambda >= 0.0 && lambda <= 1.0)
    val spark = cands.sparkSession
    import spark.implicits._
    // cogroup, not a join: a query's candidate rows (n) and sim rows (n²)
    // meet in one task without materializing the n³ join product
    val candDs = cands.select(col("query_id").cast("long"),
        col("vec_id").cast("long"), col("rel").cast("double"))
      .as[(Long, Long, Double)].groupByKey(_._1)
    val simDs = sims.select(col("query_id").cast("long"),
        col("a_id").cast("long"), col("b_id").cast("long"),
        col("sim").cast("double"))
      .as[(Long, Long, Long, Double)].groupByKey(_._1)
    candDs.cogroup(simDs) { (qid, candRows, simRows) =>
      val rel = scala.collection.mutable.LinkedHashMap.empty[Long, Double]
      val sim = scala.collection.mutable.HashMap.empty[(Long, Long), Double]
      candRows.foreach { case (_, id, r) => rel.getOrElseUpdate(id, r) }
      simRows.foreach { case (_, a, b, s) => sim((a, b)) = s }
      if (rel.isEmpty) Iterator.empty else {
      def pairSim(x: Long, y: Long): Double =
        sim.getOrElse((x, y), sim.getOrElse((y, x), 0.0))
      val avail = scala.collection.mutable.TreeSet.empty[Long] ++ rel.keys
      val out = Seq.newBuilder[(Long, Long, Int, Double)]
      var selected = List.empty[Long]
      var rank = 1
      while (rank <= k && avail.nonEmpty) {
        // argmax score, ties → smallest id (TreeSet iterates ascending and
        // strict > keeps the first maximum)
        var bestId = -1L
        var bestScore = Double.NegativeInfinity
        avail.foreach { c =>
          var maxSim = Double.NegativeInfinity
          selected.foreach { s =>
            val v = pairSim(c, s); if (v > maxSim) maxSim = v
          }
          val score = if (selected.isEmpty) lambda * rel(c)
                      else lambda * rel(c) - (1.0 - lambda) * maxSim
          if (score > bestScore) { bestScore = score; bestId = c }
        }
        avail.remove(bestId)
        selected ::= bestId
        out += ((qid, bestId, rank, bestScore))
        rank += 1
      }
      out.result().iterator
      }
    }.toDF("query_id", "vec_id", "mmr_rank", "mmr_score")
  }

  /** End-to-end diversified retrieval: brute/ANN top-n candidates per
    * query, pairwise candidate sims via the codegen kernels, then greedy
    * [[rerank]]. `corpus`/`queries` follow the [[Similarity]] conventions.
    */
  def diversifiedTopK(corpus: DataFrame, queries: DataFrame, n: Int, k: Int,
                      lambda: Double = 0.5,
                      corpusId: String = "vec_id",
                      corpusVec: String = "embedding",
                      queryId: String = "query_id",
                      queryVec: String = "qvec"): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val cands = Similarity.bruteForceTopK(corpus, queries, n,
        corpusId, corpusVec, queryId, queryVec)
      .select(col("query_id"), col("vec_id"), col("cos").as("rel"))
    val vecs = corpus.select(col(corpusId).as("vec_id"),
      VectorExpressions.normNative(col(corpusVec)).as("nv"))
    // n² scalar rows per query; vectors join in once per side and the dot
    // runs in whole-stage codegen, so the greedy loop sees only scalars
    val sims = cands.select(col("query_id"), col("vec_id").as("a_id"))
      .join(cands.select(col("query_id"), col("vec_id").as("b_id")),
        Seq("query_id"))
      .filter(col("a_id") < col("b_id"))
      .join(vecs.withColumnRenamed("vec_id", "a_id")
        .withColumnRenamed("nv", "av"), Seq("a_id"))
      .join(vecs.withColumnRenamed("vec_id", "b_id")
        .withColumnRenamed("nv", "bv"), Seq("b_id"))
      .select(col("query_id"), col("a_id"), col("b_id"),
        VectorExpressions.dotNative(col("av"), col("bv")).as("sim"))
    rerank(cands, sims, k, lambda)
  }
}
