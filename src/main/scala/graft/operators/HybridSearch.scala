package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorExpressions, VectorFunctions}

/** Hybrid retrieval with reciprocal-rank fusion (Cormack/Clarke/Büttcher
  * SIGIR'09): the standard RAG retrieval stack — a lexical BM25 arm and
  * a dense cosine arm over the same corpus, fused by
  * `Σ_arms 1/(K + rank)` so neither arm's score scale has to be
  * calibrated against the other. Scores are RANK-ONLY inputs; fusion is
  * integer (`10⁹ div (K + rank)`), so the fused ordering replays
  * bit-for-bit cross-engine.
  *
  * Determinism contract: each arm's scores are rounded to 6 dp BEFORE
  * ranking (the cross-engine-stable face both the BM25 and cosine
  * oracle queries already pin), ties break to min id, and only the
  * top-N ranks per query enter fusion. Documents missing from an arm
  * contribute nothing for it (rank surfaces as 0 in the output row).
  *
  * Scale shape: the arms do the heavy lifting with their own scale
  * paths — BM25 candidates are bounded by posting-list df, the dense
  * arm here scores the full corpus (the brute/oracle face; the
  * production swap is the IVF probe, [[Similarity.ivfTopKIndexed]],
  * feeding the SAME rankArm contract). The per-query rank window sees
  * only each arm's candidate stream, and fusion is a (query, id)
  * full-outer join over ≤ 2N rows per query — metadata-priced next to
  * the arms.
  */
object HybridSearch {

  /** Rank an arm's (query_id, id, score) stream: round(score, 6) desc,
    * min id on ties, keep rank ≤ topN. */
  def rankArm(scored: DataFrame, topN: Int): DataFrame = {
    require(topN >= 1)
    val w = Window.partitionBy("query_id")
      .orderBy(round(col("score"), 6).desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .select("query_id", "id", "rank")
  }

  /** Dense arm: cosine of every corpus vector against each query
    * vector (queries broadcast), ranked via [[rankArm]]. */
  def cosineArm(corpus: DataFrame, queries: DataFrame, topN: Int)
      : DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val c = corpus.select(col("vec_id").as("id"),
      VectorFunctions.normalize(col("embedding")).as("cv"))
    val q = queries.select(col("query_id"),
      VectorFunctions.normalize(col("qvec")).as("qv"))
    rankArm(
      c.join(broadcast(q))
        .select(col("query_id"), col("id"),
          VectorExpressions.dotNative(col("cv"), col("qv")).as("score")),
      topN)
  }

  /** Lexical arm: BM25 per query term-set, ranked via [[rankArm]]. */
  def lexicalArm(postings: DataFrame, stats: DataFrame,
                 queries: Seq[(Int, Seq[String])], topN: Int): DataFrame = {
    require(queries.nonEmpty)
    rankArm(queries.map { case (qid, terms) =>
      InvertedIndex.bm25Search(postings, stats, terms)
        .select(lit(qid).as("query_id"), col("doc_id").as("id"),
          col("score"))
    }.reduce(_ union _), topN)
  }

  /** Reciprocal-rank fusion of the two arms: integer contributions
    * `10⁹ div (rrfK + rank)` summed per (query, id); an id absent from
    * an arm carries rank 0 and contributes 0 for it. */
  def rrfFuse(lex: DataFrame, sem: DataFrame, rrfK: Int = 60)
      : DataFrame = {
    require(rrfK >= 1)
    val l = lex.withColumnRenamed("rank", "lex_rank")
    val s = sem.withColumnRenamed("rank", "sem_rank")
    l.join(s, Seq("query_id", "id"), "full_outer")
      .select(col("query_id"), col("id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0L)).as("sem_rank"),
        (coalesce(expr(s"1000000000L div ($rrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000000L div ($rrfK + sem_rank)"), lit(0L)))
          .as("rrf"))
  }
}
