package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** RAG context assembly — the retrieval last mile as ONE Catalyst plan:
  * chunk the corpus ([[Chunker]]), score every chunk against every
  * query by sparse lexical overlap, rank, and pack each query's context
  * window up to a token budget (the [[Selection]] running-total rule).
  * The fourth flagship composition (after the curation recipe, the
  * pipeline gates and the corpus pipeline): every stage is an operator
  * this library already proves, and the whole funnel stays
  * integer-decidable so the oracle replays it end-to-end.
  *
  * Scoring is the INTEGER term-frequency dot product tf_q·tf_c — exact
  * on any engine, where cosine's norms need a libm sqrt (the 1-ulp
  * hazard) and add nothing to the RANKING for a fixed query. A chunk
  * scores only if it shares a term (`minDot` floor), so the candidate
  * set has inverted-index sparsity, not |queries| × |chunks|.
  *
  * Scale shape: chunking is projection + explode (zero shuffles); the
  * score join BROADCASTS the query term table (queries are human-sized;
  * the corpus side never reshuffles for them); the only wide exchanges
  * are word-count-shaped groupBys. The budget cut is a per-query window
  * over (ids, dot, n_tok) scalars — parallelism = #queries, text long
  * gone from the stream.
  */
object Rag {

  /** One row per kept chunk: (query_id, doc_id, chunk_idx, n_tok, dot,
    * cum_before). A chunk is kept while the tokens accumulated BEFORE it
    * (in dot-desc, doc, chunk order) are under `budgetTokens` — the
    * [[Selection.takeUntilBudget]] boundary rule, so the first
    * over-budget chunk still lands and every engine cuts identically.
    */
  def assembleContext(docs: DataFrame, queries: DataFrame,
                      chunkSize: Int, overlap: Int, budgetTokens: Long,
                      minDot: Long = 1L,
                      idCol: String = "doc_id",
                      textCol: String = "text",
                      queryIdCol: String = "query_id",
                      queryTextCol: String = "qtext"): DataFrame = {
    require(budgetTokens > 0 && minDot >= 1)
    val chunks = Chunker.chunkByTokens(docs, chunkSize, overlap, idCol,
      textCol)
    val cterms = chunks
      .select(col(idCol), col("chunk_idx"), col("n_tok"),
        explode(tokens(col("chunk_text"))).as("term"))
      .groupBy(idCol, "chunk_idx", "n_tok", "term")
      .agg(count(lit(1)).as("__tfc"))
    val qterms = queries
      .select(col(queryIdCol), explode(tokens(col(queryTextCol)))
        .as("term"))
      .groupBy(queryIdCol, "term")
      .agg(count(lit(1)).as("__tfq"))
    val dots = cterms
      .join(broadcast(qterms), "term")
      .groupBy(queryIdCol, idCol, "chunk_idx", "n_tok")
      .agg(sum(col("__tfc") * col("__tfq")).as("dot"))
      .filter(col("dot") >= minDot)
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("dot").desc, col(idCol).asc, col("chunk_idx").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    dots
      .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
      .filter(col("cum_before") < budgetTokens)
      .select(col(queryIdCol), col(idCol), col("chunk_idx"),
        col("n_tok"), col("dot"), col("cum_before"))
  }
}
