package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixture planning — the arithmetic a training run does BEFORE any
  * sampling operator runs: given each source's natural token supply,
  * a target mixture weight, and a total token budget, how many tokens
  * should each source contribute, and is that under- or over-sampling
  * (epochs) of what exists? The output feeds [[Sampling.mixture]] /
  * [[Sampling.temperatureResample]] rates and is the number a run
  * report publishes next to the dataset card.
  *
  * Exactness: weights are INTEGER shares (e.g. 5 : 3 : 1 — any common
  * denominator), target = `budget · w div Σw`, epochs in ppm =
  * `target · 10⁶ div natural`. epochs_ppm > 10⁶ means the source
  * repeats (up-sampling); < 10⁶ means a subset is drawn.
  *
  * Overflow discipline (frontier budgets are 10¹³⁺ tokens, far past
  * the naive `budget · w` 64-bit ceiling): the target uses the exact
  * split identity `w·(B div Σw) + (w·(B mod Σw)) div Σw` ≡
  * `floor(B·w/Σw)` — exact at any budget while `w · Σw` fits a long
  * (shares are human-sized). epochs_ppm is exact while
  * `target ≤ 9·10¹²`; above that it switches to the quantized-divisor
  * form `target div max(natural div 10⁶, 1)` — within one ppm of
  * exact, deterministic, and replayed identically by the oracle.
  *
  * Scale shape: the token supply is one aggregate over the corpus;
  * everything after is arithmetic over #sources rows with the weight
  * total attached as a broadcast one-row crossJoin. Metadata-priced.
  */
object MixturePlan {

  /** `weights`: (source, weight ≥ 0 integer shares). Sources missing a
    * weight get 0 (drawn not at all) via the left join — deliberate:
    * an unlisted source contributes nothing, loudly visible as
    * target_tokens = 0 in the plan table rather than silently absent.
    * Returns (source, natural_tokens, weight, target_tokens,
    * epochs_ppm).
    */
  def solve(tokenCounts: DataFrame, weights: DataFrame,
            budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0)
    val w = weights.select(col(weights.columns.head).as("source"),
      col(weights.columns(1)).cast("long").as("weight"))
    val joined = tokenCounts
      .select(col(tokenCounts.columns.head).as("source"),
        col(tokenCounts.columns(1)).cast("long").as("natural_tokens"))
      .join(w, Seq("source"), "left")
      .withColumn("weight", coalesce(col("weight"), lit(0L)))
    val tot = joined.agg(sum("weight").as("__tw"))
    joined.crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        when(col("__tw") > 0,
          // exact split identity: floor(B·w/Σw) without forming B·w
          expr(s"weight * (${budgetTokens}L div __tw) + " +
            s"(weight * (${budgetTokens}L % __tw)) div __tw"))
          .otherwise(lit(0L)))
      .withColumn("epochs_ppm",
        when(col("natural_tokens") > 0,
          when(col("target_tokens") <= 9000000000000L,
            expr("target_tokens * 1000000L div natural_tokens"))
            .otherwise(expr("target_tokens div " +
              "greatest(natural_tokens div 1000000L, 1L)")))
          .otherwise(lit(0L)))
      .select("source", "natural_tokens", "weight", "target_tokens",
        "epochs_ppm")
  }
}
