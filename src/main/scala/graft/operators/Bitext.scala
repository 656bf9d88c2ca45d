package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TopKAggregate, VectorExpressions, VectorFunctions}

/** Margin-based bitext mining (Artetxe & Schwenk ACL'19, the
  * LASER/CCMatrix parallel-corpus recipe): candidate translation pairs
  * between two embedding corpora score by the MARGIN — the pair's
  * cosine normalized by the mean cosine of each side's k nearest
  * neighbors in the other corpus — which cancels the hubness that
  * makes raw cosine thresholds useless across languages. A pair is
  * kept when it is MUTUALLY top-1 and its margin clears the threshold.
  *
  * Integer-exact contract: cosines quantize to `cos_u = round(cos·1e6)`
  * BEFORE ranking (integer ordering, min-id ties — the cross-engine-
  * stable face), neighbor sums are integer, and the margin is the
  * integer `2·10⁶·cos_u·n_s·n_t div (sum_s·n_t + sum_t·n_s)` (the
  * mean-of-means denominator in ppm, exact for k ≤ ~2000 under the
  * 2·10¹²·k² < 2⁶³ envelope) — so mined pairs replay bit-for-bit in
  * DuckDB.
  *
  * Scale shape: scoring is the brute/oracle face here (one side
  * broadcast); the production swap is an IVF probe per side feeding the
  * SAME neighbor-summary contract ([[Similarity.ivfTopKIndexed]]).
  * Each side's neighbor summary is a bounded `graft_topk` AGGREGATE —
  * map-side truncation to k, no per-anchor window funnel — and the
  * mutual-top-1 join carries one row per anchor.
  */
object Bitext {

  /** All scored pairs (src_id, tgt_id, cos_u) — both directions read
    * this one projection. */
  private def scoredPairs(src: DataFrame, tgt: DataFrame,
                          idCol: String, vecCol: String): DataFrame = {
    VectorExpressions.register(src.sparkSession)
    val s = src.select(col(idCol).as("src_id"),
      VectorFunctions.normalize(col(vecCol)).as("sv"))
    val t = tgt.select(col(idCol).as("tgt_id"),
      VectorFunctions.normalize(col(vecCol)).as("tv"))
    s.join(broadcast(t))
      .select(col("src_id"), col("tgt_id"),
        round(VectorExpressions.dotNative(col("sv"), col("tv")) * 1e6)
          .cast("long").as("cos_u"))
  }

  /** Per-anchor neighbor summary over the other side: best id + its
    * cos_u, the top-k integer cosine sum, and the actual neighbor
    * count (short sides yield n < k; the margin uses real means). */
  private def nbrSummary(pairs: DataFrame, anchor: String, other: String,
                         k: Int): DataFrame = {
    TopKAggregate.register(pairs.sparkSession)
    pairs.groupBy(anchor)
      .agg(TopKAggregate.topK(
        struct(col("cos_u").cast("double").as("c"), col(other)),
        lit(k)).as("tk"))
      .select(col(anchor),
        col("tk")(0)(other).as("best"),
        col("tk")(0)("c").cast("long").as("best_cos_u"),
        expr("aggregate(tk, 0L, (acc, x) -> acc + CAST(x.c AS BIGINT))")
          .as("sum_u"),
        size(col("tk")).cast("long").as("n_nbrs"))
  }

  /** Mutual-top-1 pairs with integer margins ≥ `minMarginPpm`
    * (1e6 = margin 1.0, i.e. the pair's cosine equals the mean of its
    * neighborhoods' — real translations sit well above). Returns
    * (src_id, tgt_id, cos_u, margin_ppm), one row per mined pair. */
  def minePairs(src: DataFrame, tgt: DataFrame, k: Int = 4,
                minMarginPpm: Long = 1000000L,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && minMarginPpm >= 0)
    val pairs = scoredPairs(src, tgt, idCol, vecCol)
    val sSum = nbrSummary(pairs, "src_id", "tgt_id", k)
    val tSum = nbrSummary(pairs, "tgt_id", "src_id", k)
      .select(col("tgt_id"), col("best").as("t_best"),
        col("sum_u").as("t_sum_u"), col("n_nbrs").as("t_n"))
    sSum
      .join(tSum, sSum("best") === tSum("tgt_id") &&
        tSum("t_best") === sSum("src_id"))
      // non-positive neighborhood sums (possible only on degenerate
      // all-negative neighborhoods) make the margin meaningless — emit
      // 0 instead of an ANSI division error; the threshold drops them
      .withColumn("__den", expr("sum_u * t_n + t_sum_u * n_nbrs"))
      .select(col("src_id"), col("tgt_id"),
        col("best_cos_u").as("cos_u"),
        when(col("__den") > 0,
          expr("(2000000L * best_cos_u * n_nbrs * t_n) div __den"))
          .otherwise(lit(0L)).as("margin_ppm"))
      .filter(col("margin_ppm") >= minMarginPpm)
  }
}
