package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{normalizeText, shinglesFromTokens, tokens}

/** Gopher-style repetition filters: documents dominated by a few repeated
  * n-grams are low-quality training data (boilerplate, keyword stuffing,
  * degenerate generations). Published pipelines gate on "fraction of the
  * document covered by the most frequent n-gram"; this implements the
  * token-count variant of those rules.
  *
  * Metrics per document:
  *  - `n_tokens` — whitespace token count of the normalized text.
  *  - `distinct_frac` — distinct tokens / total tokens (1.0 for empty docs:
  *    emptiness is a length problem, not a repetition problem).
  *  - `top2gram_frac` / `top3gram_frac` — occurrences of the most frequent
  *    word n-gram × n / n_tokens; 0.0 when the doc has fewer than n tokens.
  *    Overlapping occurrences each count, so a degenerate "a a a a" doc
  *    scores > 1 — deliberately: the gate is a ≤-threshold.
  *
  * Line-level duplicate metrics (Gopher's dup-line fraction) are omitted:
  * the corpus here is single-line, where they collapse into exact-dedup
  * ([[Dedup.exactDedup]] covers that).
  *
  * Scale shape: the text is tokenized ONCE (token table persisted across
  * the two gram sizes), every aggregation is a codegen'd hash aggregate
  * with map-side partials, and the final join carries only scalar columns —
  * one row per document on each side. Nothing re-shuffles text.
  */
object Repetition {

  def metrics(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    // persisted for the two gram-size consumers; the returned plan is lazy
    // so the entry is left to Spark's LRU (an eager unpersist here would
    // force recomputation) — long-running sessions composing many
    // operators can spark.catalog.clearCache() between stages
    val toks = Dedup.spread(
        docs.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), tokens(normalizeText(col("__text"))).as("tk"))
      .persist()

    val base = toks.select(col("id"), size(col("tk")).as("n_tokens"),
      size(array_distinct(col("tk"))).as("n_distinct"))

    // one exploded (id, n, gram) stream for both sizes; counting the top
    // gram is groupBy(id, n, gram) → groupBy(id) max — two partial-agg
    // shuffles whose final volume is one row per document
    val grams = Seq(2, 3).map { n =>
      toks.filter(size(col("tk")) >= n)
        .select(col("id"), lit(n).as("n"),
          explode(shinglesFromTokens(col("tk"), n)).as("g"))
    }.reduce(_ union _)
    val tops = grams.groupBy("id", "n", "g").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(max(when(col("n") === 2, col("c"))).as("top2c"),
           max(when(col("n") === 3, col("c"))).as("top3c"))

    base.join(tops, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        when(col("n_tokens") === 0, lit(1.0))
          .otherwise(col("n_distinct").cast("double") / col("n_tokens"))
          .as("distinct_frac"),
        coalesce(col("top2c") * 2.0 / col("n_tokens"), lit(0.0))
          .as("top2gram_frac"),
        coalesce(col("top3c") * 3.0 / col("n_tokens"), lit(0.0))
          .as("top3gram_frac"))
  }

  /** Quality gate on the repetition metrics (Gopher-ish defaults). Returns
    * the surviving documents via left-semi join — text never re-shuffles.
    *
    * Composition note: this references `docs` twice (metrics + join back),
    * so chaining gates as keep(keep(keep(df))) doubles the upstream plan
    * per stage. When composing several gates, compute each keep-id set
    * from the BASE corpus via [[metrics]] and intersect the id sets with
    * semi-joins instead (metrics are per-doc, hence subset-invariant) —
    * see SparkEntry q_pipeline_gates. */
  def keep(docs: DataFrame, minDistinctFrac: Double = 0.2,
           maxTop2Frac: Double = 0.20, maxTop3Frac: Double = 0.18,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ok = metrics(docs, idCol, textCol)
      .filter(col("distinct_frac") >= minDistinctFrac &&
        col("top2gram_frac") <= maxTop2Frac &&
        col("top3gram_frac") <= maxTop3Frac)
      .select(idCol)
    docs.join(ok, Seq(idCol), "left_semi")
  }
}
