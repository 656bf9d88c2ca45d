package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Alignment-data preparation: best-of-n selection and DPO preference
  * pairs (Rafailov NeurIPS'23 §3; Stiennon NeurIPS'20's comparison
  * collection) over reward-scored generation logs. The input shape is
  * the standard RLHF sampling layout — each prompt has a fixed fan of
  * sampled completions, each carrying a reward-model score — and the
  * two outputs are the two standard consumers: the argmax completion
  * per prompt (rejection sampling / best-of-n SFT) and the
  * (chosen, rejected) pair with its reward margin (DPO/RLHF training
  * rows).
  *
  * Semantics are EXACT and engine-portable: rewards in integer cents
  * (`round(value·100)` — the 2-decimal money convention, IEEE-exact to
  * round), chosen = max reward with min-id tie-break, rejected = min
  * reward with min-id tie-break, pairs kept only when the margin
  * clears `minMarginCents` (which also drops all-tied groups where
  * chosen = rejected would degenerate).
  *
  * Scale shape: ONE hash exchange on prompt_id; both argmaxes are
  * struct-ordered min/max AGGREGATES (map-side partial combine, no
  * per-prompt row_number funnel), so the reduce side carries one row
  * per prompt regardless of the sampling fan. At 100 TB the fan n is a
  * constant (8-64 samples/prompt) and the output is corpus/n rows —
  * this shape is the floor.
  */
object Preference {

  /** Reward-scored candidate fan: completions are grouped `fan` per
    * prompt by contiguous id (the sampler's layout), rewards become
    * integer cents. */
  def candidates(events: DataFrame, fan: Int = 8): DataFrame = {
    require(fan >= 2, "need fan >= 2")
    events.select(
      expr(s"event_id div $fan").as("prompt_id"),
      col("event_id").as("cand_id"),
      round(col("value") * 100).cast("long").as("reward_c"))
  }

  /** Best-of-n: the max-reward candidate per prompt (ties → min id),
    * with the group's reward spread for audit. */
  def bestOfN(cands: DataFrame): DataFrame =
    cands.groupBy("prompt_id")
      .agg(
        max(struct(col("reward_c"), (-col("cand_id")).as("neg_id")))
          .as("__best"),
        count(lit(1)).as("n_cands"),
        min("reward_c").as("min_reward_c"))
      .select(col("prompt_id"),
        (-col("__best.neg_id")).as("chosen_id"),
        col("__best.reward_c").as("reward_c"),
        col("n_cands"), col("min_reward_c"))

  /** DPO rows: (chosen, rejected, margin) per prompt, keeping only
    * groups with ≥2 candidates and margin ≥ `minMarginCents`. Rejected
    * is the MIN-reward candidate (min id on ties) — the maximal-margin
    * pair convention. */
  def preferencePairs(cands: DataFrame, minMarginCents: Long = 1)
      : DataFrame = {
    require(minMarginCents >= 1, "margin gate must be positive")
    cands.groupBy("prompt_id")
      .agg(
        max(struct(col("reward_c"), (-col("cand_id")).as("neg_id")))
          .as("__ch"),
        min(struct(col("reward_c"), col("cand_id"))).as("__rj"),
        count(lit(1)).as("n_cands"))
      .filter(col("n_cands") >= 2)
      .select(col("prompt_id"),
        (-col("__ch.neg_id")).as("chosen_id"),
        col("__rj.cand_id").as("rejected_id"),
        (col("__ch.reward_c") - col("__rj.reward_c")).as("margin_c"),
        col("n_cands"))
      .filter(col("margin_c") >= minMarginCents)
  }
}
