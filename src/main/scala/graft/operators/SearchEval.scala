package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation for the retrieval family — the metrics a
  * training-data pipeline reports when it tunes its search/RAG stack:
  * nDCG@k, MRR and precision@k per query. All three are emitted in
  * EXACT integer units so the face sits under the cross-engine oracle:
  *
  *  - the nDCG log2 discount is an integer weight table
  *    `w(r) = round(10⁶ / log2(r+1))`, computed ONCE on the driver and
  *    shared VERBATIM with the oracle SQL (a floating-point log inside
  *    the query would be 1-ulp fragile across engines, and a sum of
  *    per-rank doubles additionally depends on accumulation order);
  *  - `ndcg_u` = (10⁹ · DCG_u) div IDCG_u over the integer DCGs
  *    (10⁹ · max-DCG ≈ 3·10¹⁶ stays far under 2⁶³ — no overflow, and
  *    `div` keeps it in exact integer arithmetic: a long→double divide
  *    would lose exactness past 2⁵³);
  *  - `mrr_u` = 10⁶ div first-relevant rank (0 when none retrieved);
  *  - `p_at_k_u` = (hits · 10⁶) div k;
  *  - `ap_u` (average precision, binary relevance): every precision@i
  *    term hits@i / i is made integral by scaling with L = lcm(1..k) —
  *    hits@i · (L div i) is exact for every rank i ≤ k — so
  *    `ap_u = (10⁶ · Σ terms) div (L · min(R, k))` with R = |relevant
  *    judged docs| (the trec_eval truncated-MAP denominator). L caps
  *    the supported k at 20 (lcm(1..20) ≈ 2.3·10⁸; the scaled sum
  *    reaches k·L·10⁶ ≈ 4.7·10¹⁵, still exact in long — larger k would
  *    overflow, and ranking eval past k=20 is nonstandard anyway).
  *
  * IDCG ranks the FULL qrels set (not just retrieved docs), ties broken
  * by doc_id ascending — the standard trec_eval convention, and the one
  * deterministic enough to hash-match across engines.
  *
  * Scale shape: the ranked results are ≤ k rows per query by contract,
  * so the metrics join moves O(queries × k) rows; the ideal ranking is
  * one window over the qrels (O(judged docs) — judgment lists are
  * thousands of rows when corpora are billions); the final aggregate is
  * one exchange keyed by query_id. Nothing corpus-shaped.
  */
object SearchEval {

  /** Integer nDCG discount weights for ranks 1..k: round(10⁶/log2(r+1)).
    * Driver-side constants — interpolate the SAME values into any oracle
    * replaying the metric, never recompute logs engine-side. */
  def discountWeightsU(k: Int): Seq[Long] =
    (1 to k).map(r =>
      math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  /** lcm(1..k) — the integral scale for AP's precision@i terms. Like the
    * discount table, a driver-side constant to interpolate into oracles. */
  def lcmTo(k: Int): Long = {
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    (1L to k.toLong).foldLeft(1L)((l, i) => l / gcd(l, i) * i)
  }

  /** `results`: (query_id, doc_id, rank) with rank 1-based; `qrels`:
    * (query_id, doc_id, rel ≥ 0) graded judgments. Returns one row per
    * query with ≥ 1 retrieved doc: (query_id, ndcg_u, mrr_u, p_at_k_u). */
  def rankingMetrics(results: DataFrame, qrels: DataFrame,
                     k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"k=$k out of range (AP's lcm scale)")
    val wArr = array(discountWeightsU(k).map(lit): _*)
    val L = lcmTo(k)
    val judged = qrels.select(col("query_id"), col("doc_id"),
      col("rel").cast("long").as("rel"))
    val got = results.filter(col("rank") <= k)
      .join(judged, Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
      // hits@rank, for AP's precision terms (same single exchange: the
      // window and the aggregate below both key on query_id)
      .withColumn("cumhits", sum(when(col("rel") > 0, 1L).otherwise(0L))
        .over(Window.partitionBy("query_id").orderBy("rank")))
      .groupBy("query_id")
      .agg(
        sum(col("rel") *
          element_at(wArr, col("rank").cast("int"))).as("dcg_u"),
        min(when(col("rel") > 0, col("rank"))).as("first_rel"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("hits"),
        sum(when(col("rel") > 0,
          col("cumhits") * expr(s"$L div rank")).otherwise(lit(0L)))
          .as("ap_num"))
    val ideal = judged.filter(col("rel") > 0)
      .withColumn("rn", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("rel").desc, col("doc_id").asc)))
      .groupBy("query_id")
      .agg(sum(when(col("rn") <= k,
          col("rel") * element_at(wArr, col("rn").cast("int")))
          .otherwise(lit(0L))).as("idcg_u"),
        count(lit(1)).as("r_total"))
    got.join(ideal, Seq("query_id"), "left")
      .select(col("query_id"),
        when(coalesce(col("idcg_u"), lit(0L)) > 0,
          expr("(1000000000 * dcg_u) div idcg_u"))
          .otherwise(lit(0L)).cast("long").as("ndcg_u"),
        when(col("first_rel").isNotNull, expr("1000000 div first_rel"))
          .otherwise(lit(0L)).cast("long").as("mrr_u"),
        expr(s"(hits * 1000000) div $k").cast("long").as("p_at_k_u"),
        when(coalesce(col("r_total"), lit(0L)) > 0,
          expr(s"(1000000 * ap_num) div ($L * least(r_total, $k))"))
          .otherwise(lit(0L)).cast("long").as("ap_u"))
  }
}
