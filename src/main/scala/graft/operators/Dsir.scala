package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{normalizeText, tokens}

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * arXiv:2302.03169): score each raw document by how much its unigram
  * distribution looks like a TARGET corpus rather than the RAW corpus,
  * then keep the top slice. The published method hashes n-grams into a
  * fixed bucket space so the weight table is O(buckets) regardless of
  * vocabulary; both paths are here:
  *
  *  - [[scoreExact]] — explicit-vocabulary unigram weights. Every number
  *    a consumer sees is either an integer or `ln` of an integer ratio,
  *    so a DuckDB oracle replays it (same smoothing, same tokenizer).
  *  - [[scoreHashed]] — the scale path: tokens hash into `buckets` via
  *    xxhash64, the weight table is a fixed-size array regardless of
  *    vocab, broadcast to the scorer. Hash collisions perturb scores
  *    (the paper's own trade), so this path is spec-checked against
  *    [[scoreExact]] for rank agreement instead of oracle-checked.
  *
  * Scale shape (the 100 TB story):
  *  - One tokenize pass per corpus; the wide exchanges carry (token) or
  *    (bucket) fixed-width pairs with map-side partial counts — the
  *    word-count shuffle, never raw text.
  *  - The weight table is vocabulary-sized (exact) or buckets-sized
  *    (hashed). The hashed table is bounded by construction and joined
  *    broadcast; the exact table join defaults to broadcast for bounded
  *    vocabs and degrades to a shuffle join that reuses the token
  *    partitioning when `broadcastWeights = false`.
  *  - Scoring is explode → join → per-doc sum: one aggregate keyed by
  *    doc id. No driver-side loops; target-corpus totals travel as
  *    one-row broadcast literals.
  */
object Dsir {

  /** Per-token log importance weights from add-1-smoothed unigram LMs:
    * w(t) = ln((cntT(t)+1)/(NT+V)) − ln((cntR(t)+1)/(NR+V)) over the raw
    * corpus vocabulary V. Returns (term, cnt_target, cnt_raw, w).
    */
  private def tokenized(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = Dedup.spread(
      df.select(col(idCol).as("id"), normalizeText(col(textCol)).as("__t")))
    .select(col("id"), explode(tokens(col("__t"))).as("term"))

  /** Weight table from pre-aggregated term counts — shared by
    * [[unigramWeights]] and [[scoreExact]] (which reuses one tokenize
    * pass of the raw corpus for both counting and scoring).
    */
  private def weightsFromCounts(rawCnt: DataFrame,
                                tgtCnt: DataFrame): DataFrame = {
    // raw vocabulary carries the weight table: a token absent from raw
    // cannot appear in a raw document being scored, so the left join is
    // total for scoring purposes. Persisted (vocab-sized): the totals
    // aggregate AND the weight projection both consume it — unpersisted,
    // Catalyst re-evaluates the whole count subtree (re-tokenizing the
    // target corpus) once per consumer.
    val joined = rawCnt.join(tgtCnt, Seq("term"), "left")
      .na.fill(0L, Seq("cnt_target"))
      .persist()
    val totals = joined.agg(
        sum("cnt_raw").as("__nr"), sum("cnt_target").as("__nt"),
        count(lit(1)).as("__v"))
    joined.crossJoin(broadcast(totals))
      .select(col("term"), col("cnt_target"), col("cnt_raw"),
        (log((col("cnt_target") + 1).cast("double") /
             (col("__nt") + col("__v"))) -
         log((col("cnt_raw") + 1).cast("double") /
             (col("__nr") + col("__v")))).as("w"))
  }

  def unigramWeights(raw: DataFrame, target: DataFrame,
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame =
    weightsFromCounts(
      tokenized(raw, idCol, textCol)
        .groupBy("term").agg(count(lit(1)).as("cnt_raw")),
      tokenized(target, idCol, textCol)
        .groupBy("term").agg(count(lit(1)).as("cnt_target")))

  /** Per-document importance score: Σ over token OCCURRENCES of w(t).
    * Returns (idCol, n_tokens, score). Deterministic given the corpora;
    * the float sum is exact to ~1e-12 relative on any engine, so a
    * consumer rounding to 6 decimals sees identical numbers.
    */
  def scoreExact(raw: DataFrame, target: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text",
                 broadcastWeights: Boolean = true): DataFrame = {
    // ONE tokenize pass over the raw corpus, persisted: the weight table
    // aggregates it and the scorer explodes it again — without the
    // materialization Spark re-tokenizes the full corpus per consumer
    // (the TfIdf lesson). The target corpus (typically small and often
    // disjoint) is tokenized separately.
    val toks = tokenized(raw, idCol, textCol).persist()
    val w0 = weightsFromCounts(
        toks.groupBy("term").agg(count(lit(1)).as("cnt_raw")),
        tokenized(target, idCol, textCol)
          .groupBy("term").agg(count(lit(1)).as("cnt_target")))
      .select("term", "w")
    val w = if (broadcastWeights) broadcast(w0) else w0
    toks.join(w, "term")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("score"))
      .withColumnRenamed("id", idCol)
  }

  /** Hashed-feature scoring (the paper's actual construction): tokens
    * hash into `buckets`; weights live on buckets. Collisions merge
    * token statistics — rank agreement with [[scoreExact]] is the spec
    * contract, not equality.
    */
  def scoreHashed(raw: DataFrame, target: DataFrame, buckets: Int,
                  idCol: String = "doc_id", textCol: String = "text"
                 ): DataFrame = {
    require(buckets > 0)
    def bucketed(df: DataFrame) = tokenized(df, idCol, textCol)
      .select(col("id"), pmod(xxhash64(col("term")), lit(buckets)).as("b"))
    // one persisted tokenize+hash pass over the raw corpus feeds both
    // the bucket counts and the scorer — the same single-pass shape as
    // [[scoreExact]] (re-tokenizing the heaviest input per consumer is
    // the trap); smoothing over `buckets` replaces the vocab-size term
    val toks = bucketed(raw).persist()
    val rawCnt = toks.groupBy("b").agg(count(lit(1)).as("cnt_raw"))
    val tgtCnt = bucketed(target)
      .groupBy("b").agg(count(lit(1)).as("cnt_target"))
    val joined = rawCnt.join(tgtCnt, Seq("b"), "left")
      .na.fill(0L, Seq("cnt_target"))
      .persist() // bucket-sized; totals + weight projection both read it
    val totals = joined.agg(
        sum("cnt_raw").as("__nr"), sum("cnt_target").as("__nt"))
    val w = broadcast(joined.crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("cnt_target") + 1).cast("double") /
             (col("__nt") + buckets)) -
         log((col("cnt_raw") + 1).cast("double") /
             (col("__nr") + buckets))).as("w")))
    toks.join(w, "b")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("score"))
      .withColumnRenamed("id", idCol)
  }
}
