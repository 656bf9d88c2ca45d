package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TopKAggregate, VectorExpressions, VectorFunctions}

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
  * paths — BM25 candidates are bounded by posting-list df and ranked
  * by a window over that candidate stream; the dense arm scores the
  * full corpus (the brute/oracle face; the production swap is the IVF
  * probe, [[Similarity.ivfTopKIndexed]], feeding the same contract)
  * but truncates to topN per query on the MAP side via the bounded
  * `graft_topk` aggregate, so even the brute face has no per-query
  * window funnel. Fusion is a (query, id) full-outer join over ≤ 2N
  * rows per query — metadata-priced next to the arms.
  */
object HybridSearch {

  /** Rank an arm's (query_id, id, score) stream: round(score, 6) desc,
    * min id on ties, keep rank ≤ topN.
    *
    * This window form is for CANDIDATE streams already bounded upstream
    * (the BM25 arm's posting-list df bound, an IVF probe's list bound) —
    * the partition a reducer sees is the candidate set, not the corpus.
    * Full-corpus scored streams must go through [[boundedRankArm]]
    * instead, where the map side truncates to topN before the exchange.
    */
  def rankArm(scored: DataFrame, topN: Int): DataFrame = {
    require(topN >= 1)
    val w = Window.partitionBy("query_id")
      .orderBy(round(col("score"), 6).desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .select("query_id", "id", "rank")
  }

  /** Same output contract as [[rankArm]] — (query_id, id, rank) by
    * round(score, 6) desc / min-id ties — but via the bounded
    * `graft_topk` aggregate: ObjectHashAggregate keeps a ≤ topN buffer
    * per query on the MAP side, so the exchange carries
    * partitions × queries × topN rows instead of the full scored
    * stream, and no reducer ever sorts a whole query partition. */
  def boundedRankArm(scored: DataFrame, topN: Int): DataFrame = {
    require(topN >= 1)
    TopKAggregate.register(scored.sparkSession)
    scored
      .groupBy("query_id")
      .agg(TopKAggregate.topK(
        struct(round(col("score"), 6).cast("double").as("score"),
          col("id")), lit(topN)).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("id"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Dense arm: cosine of every corpus vector against each query
    * vector (queries broadcast), top-N per query via the bounded
    * [[boundedRankArm]] aggregate — the full-corpus scored stream never
    * crosses an exchange (each map partition forwards ≤ topN rows per
    * query), so there is no per-query window funnel even in this
    * brute/oracle face. The production swap at scale is the IVF probe
    * ([[Similarity.ivfTopKIndexed]]) feeding the same contract. */
  def cosineArm(corpus: DataFrame, queries: DataFrame, topN: Int)
      : DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val c = corpus.select(col("vec_id").as("id"),
      VectorFunctions.normalize(col("embedding")).as("cv"))
    val q = queries.select(col("query_id"),
      VectorFunctions.normalize(col("qvec")).as("qv"))
    boundedRankArm(
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
    // Contributions are computed in a SEPARATE select from the
    // coalesce(...).as("lex_rank") re-aliasing: a same-select sibling
    // of an alias that shadows its own input column risks Spark's
    // lateral-column-alias resolution reading the aliased (zeroed)
    // value — which would score absent arms 10⁹ div rrfK instead of 0.
    l.join(s, Seq("query_id", "id"), "full_outer")
      .withColumn("__lex_c",
        coalesce(expr(s"1000000000L div ($rrfK + lex_rank)"), lit(0L)))
      .withColumn("__sem_c",
        coalesce(expr(s"1000000000L div ($rrfK + sem_rank)"), lit(0L)))
      .select(col("query_id"), col("id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0L)).as("sem_rank"),
        (col("__lex_c") + col("__sem_c")).as("rrf"))
  }
}
