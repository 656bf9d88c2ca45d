package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{normalizeText, shinglesFromTokens, tokens}

/** N-gram language-model quality filtering (the CCNet/KenLM recipe): train
  * a smoothed bigram model on a reference corpus, score every document by
  * its mean token log-probability, and gate out the tails — gibberish
  * scores far below the mass, boilerplate far above. The reference engine
  * has no equivalent; judged pipeline extension alongside SURVEY §2.
  *
  * Model: add-k smoothing, logP(w2|w1) = ln((c(w1,w2) + k) / (c(w1) + k·V)).
  * A bigram with unseen w1 backs off to ln(1/V).
  *
  * Determinism contract: log-probs are SCALED TO INTEGERS (round(ln·1e6))
  * at training time, and a document's score is an integer SUM of those —
  * float addition is order-dependent and Spark's partial aggregation order
  * is not DuckDB's, so summing doubles would make the oracle flaky, while
  * integer sums commute exactly. The one division (sum / 1e6 / count)
  * happens once per document on exact integers, so both engines produce
  * the identical double.
  *
  * Scale shape: training is the word-count shuffle twice (bigram counts,
  * unigram counts); vocab-sized model tables broadcast for bounded
  * vocabularies (`broadcastModel = false` falls back to shuffle joins for
  * open web vocab). Scoring shuffles fixed-width (doc, w1, w2) triples
  * only; the per-doc aggregate is the usual two-phase sum/count.
  */
object LangModel {

  /** Scaled-integer log-prob tables trained on `corpus`:
    * pairs (w1, w2, lp), unigrams (w1, lp_unseen), vocabSize, and the
    * unseen-context fallback ln(1/V) — all lp values = round(ln·1e6).
    */
  final case class BigramLm(pairs: DataFrame, unigrams: DataFrame,
                            vocabSize: Long, lpUnseenContext: Long)

  private def docBigrams(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    Dedup.spread(docs.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), tokens(normalizeText(col("__text"))).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("id"), explode(shinglesFromTokens(col("tk"), 2)).as("bg"))
      .select(col("id"),
        substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))

  def trainBigram(corpus: DataFrame, k: Double = 1.0,
                  textCol: String = "text"): BigramLm = {
    require(k > 0)
    val bg = docBigrams(corpus, corpus.columns.head, textCol)
      .select("w1", "w2")
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // persisted for the pairs + unigrams consumers; left to LRU eviction
    // (the returned model tables are lazy — see Repetition for the rule)
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1")).persist()
    val v = corpus
      .select(explode(tokens(normalizeText(col(textCol)))).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    val scale = (lp: org.apache.spark.sql.Column) =>
      round(lp * 1e6).cast("long")
    val pairs = c12.join(c1, "w1")
      .select(col("w1"), col("w2"),
        scale(log((col("c12") + k) / (col("c1") + k * v))).as("lp"))
    val unigrams = c1.select(col("w1"),
      scale(log(lit(k) / (col("c1") + k * v))).as("lp_unseen"))
    // HALF_UP (away from zero) to match SQL round() on the negative logs;
    // math.round would round -x.5 toward +inf and diverge from the oracle
    BigramLm(pairs, unigrams, v,
      BigDecimal(math.log(1.0 / v) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
  }

  /** Per-document mean bigram log-prob under the model:
    * (idCol, n_bigrams, avg_logp). Documents with fewer than two tokens
    * get NULL avg_logp (no bigram evidence — length gates handle them).
    */
  def score(docs: DataFrame, lm: BigramLm, idCol: String = "doc_id",
            textCol: String = "text", broadcastModel: Boolean = true)
      : DataFrame = {
    val p = if (broadcastModel) broadcast(lm.pairs) else lm.pairs
    val u = if (broadcastModel) broadcast(lm.unigrams) else lm.unigrams
    docBigrams(docs, idCol, textCol)
      .join(p, Seq("w1", "w2"), "left")
      .join(u, Seq("w1"), "left")
      .select(col("id"),
        coalesce(col("lp"), col("lp_unseen"), lit(lm.lpUnseenContext))
          .as("slp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum("slp").as("ssum"))
      .select(col("id").as(idCol), col("n_bigrams"),
        (col("ssum").cast("double") / 1e6 / col("n_bigrams"))
          .as("avg_logp"),
        // the EXACT integer the average derives from — consumers that
        // need engine-portable values (oracle faces, deterministic
        // bucketing) should derive them from this rather than rounding
        // the double (decimal round-half ties broke at sf0.1: two
        // engines' round(x, 6) can disagree by one ulp of the 6th place)
        col("ssum").as("ssum_micro"))
  }

  /** Gate: docs whose mean log-prob lies within [minAvgLogp, maxAvgLogp]
    * (two-sided — the high tail is boilerplate, the low tail gibberish).
    * Short docs (< 2 tokens, no score) are dropped. */
  def keep(docs: DataFrame, lm: BigramLm, minAvgLogp: Double,
           maxAvgLogp: Double = 0.0, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    val ok = score(docs, lm, idCol, textCol)
      .filter(col("avg_logp") >= minAvgLogp &&
        col("avg_logp") <= maxAvgLogp)
      .select(idCol)
    docs.join(ok, Seq(idCol), "left_semi")
  }
}
