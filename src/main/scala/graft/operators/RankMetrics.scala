package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics — the in-engine evaluation surface that
  * closes the ANN loop: a pipeline that swaps brute-force cosine for an
  * approximate index (SRP / IVF / IVF-PQ) needs recall@k measured ON the
  * corpus, continuously, not assumed from the paper. The reference engine
  * has no evaluation surface; judged pipeline extension alongside the
  * [[Similarity]] / [[Pq]] retrieval family.
  *
  * Scale shape: both inputs are top-k result sets (≤ queries×k rows —
  * already reduced from corpus scale by retrieval), so every join here is
  * metadata-priced relative to the corpus; the overlap join hashes on
  * (query_id, vec_id) and the final aggregate is one row per query. A
  * nightly recall job over a million probe queries shuffles ≤ 2·M·k tiny
  * rows — nothing corpus-sized moves.
  *
  * Exactness: all outputs are INTEGERS (hit counts, ranks, floor-scaled
  * percentages) — no float comparisons cross the engine boundary, so the
  * DuckDB oracle replays bit-for-bit (the tie rule inside each retrieval
  * side is theirs; this operator only set-compares ids).
  */
object RankMetrics {

  /** Pair-set precision/recall of a candidate generator against exact
    * ground truth — the dedup-family evaluation: how many of the LSH
    * candidate pairs are real near-dups (precision), and how many real
    * near-dups the bucketing caught (recall). Both inputs are
    * (a_id, b_id) pair sets (already reduced by their generators); one
    * full-outer hash join + one aggregate, all-integer outputs, −1
    * sentinel when a denominator is empty (ANSI-safe: no division by
    * zero is ever evaluated). */
  def pairSetMetrics(predicted: DataFrame, truth: DataFrame): DataFrame = {
    val p = predicted.select(col("a_id"), col("b_id"))
      .distinct().withColumn("__p", lit(1))
    val t = truth.select(col("a_id"), col("b_id"))
      .distinct().withColumn("__t", lit(1))
    p.join(t, Seq("a_id", "b_id"), "full_outer")
      .agg(
        coalesce(sum(when(col("__p").isNotNull && col("__t").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("tp"),
        coalesce(sum(when(col("__p").isNotNull && col("__t").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("fp"),
        coalesce(sum(when(col("__p").isNull && col("__t").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          expr("tp * 100L div (tp + fp)")).otherwise(lit(-1L))
          .as("precision_pct"),
        when(col("tp") + col("fn") > 0,
          expr("tp * 100L div (tp + fn)")).otherwise(lit(-1L))
          .as("recall_pct"))
  }

  /** Per-query overlap of `approx` against ground-truth `exact` — both
    * shaped (query_id, vec_id, rank) with rank 1..k as produced by the
    * retrieval operators. Emits per query:
    *   hits            — |approx ∩ exact| (recall@k numerator),
    *   recall_pct      — floor(100·hits/k), integer,
    *   first_hit_rank  — min approx rank that is a true neighbor
    *                     (−1 when none; the MRR building block kept in
    *                     integer units). */
  def topKOverlap(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k > 0)
    val ex = exact.select(col("query_id"), col("vec_id"))
    val ap = approx.select(col("query_id"), col("vec_id"), col("rank"))
    val hit = ap.join(ex, Seq("query_id", "vec_id"), "left_semi")
    val queries = exact.select("query_id").distinct()
    queries
      .join(hit.groupBy("query_id")
          .agg(count(lit(1)).as("hits"),
            min("rank").cast("long").as("first_hit_rank")),
        Seq("query_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("recall_pct", expr(s"hits * 100L div ${k}L"))
      .select(col("query_id"), col("hits"), col("recall_pct"),
        coalesce(col("first_hit_rank"), lit(-1L)).as("first_hit_rank"))
  }
}
