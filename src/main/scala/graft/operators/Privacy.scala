package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local differential privacy via randomized response (Warner 1965 —
  * the mechanism RAPPOR built on): each record's binary signal is
  * reported truthfully with probability 1−p and flipped with
  * probability p, so no individual row's stored value proves anything
  * about that individual, while the population rate debiases exactly:
  * for true rate r, E[observed] = r(1−p) + (1−r)p, hence
  * r̂ = (obs − p) / (1 − 2p). The ε-DP guarantee is
  * ε = ln((1−p)/p) for the single binary attribute.
  *
  * The coin here is a SEEDED DETERMINISTIC hash (md5 of seed‖id mapped
  * to [0, 10⁶) ppm) rather than an OS RNG — the property that makes the
  * whole mechanism exactly replayable cross-engine (the DuckDB oracle
  * recomputes every flip), auditable after the fact, and idempotent
  * across pipeline retries (a re-run flips the SAME rows, so a retry
  * never doubles the noise). A deployment wanting unpredictability to
  * an adversary who knows the seed swaps the hash for a keyed one
  * (HMAC) or a real RNG — the estimator and its accounting are
  * unchanged. ε accounting, the debiased estimate and its variance are
  * all integer-ppm arithmetic (no libm; callers exponentiate ε offline).
  *
  * Scale shape: one map-side-combinable aggregate per group — counts
  * only cross the exchange; the per-row coin is a codegen'd md5 over
  * (seed, id), no shuffle of raw signals.
  */
object Privacy {

  /** Per-row randomized response: `outCol` = the privatized bit.
    * `pPpm` = flip probability in ppm (e.g. 250000 = 1/4 → ε = ln 3). */
  def randomizedResponse(df: DataFrame, idCol: String, signalCol: String,
                         pPpm: Long, seed: String,
                         outCol: String = "rr_bit"): DataFrame = {
    require(pPpm > 0 && pPpm < 500000,
      "flip probability must be in (0, 0.5) — at 0.5 the signal is gone")
    // md5(seed‖id) → first 12 hex chars → uniform ppm in [0, 10⁶):
    // 48 bits mod 10⁶ (bias ≤ 2⁻²⁸ per bucket, and IDENTICALLY biased
    // in the oracle's replay — exactness is cross-engine, the tiny
    // nonuniformity is documented, not hidden)
    val coin = conv(substring(md5(concat(lit(seed), lit("|"),
      col(idCol).cast("string"))), 1, 12), 16, 10).cast("long") % 1000000L
    df.withColumn(outCol,
      when(coin < pPpm, lit(1) - col(signalCol).cast("int"))
        .otherwise(col(signalCol).cast("int")))
  }

  /** Group-level debiased rate estimate from privatized bits, all
    * integer ppm: r̂_ppm = (obs_ppm − p_ppm) · 10⁶ / (10⁶ − 2p_ppm),
    * clamped to [0, 10⁶] (small groups can debias past the ends).
    * Output: group, n, n_reported (privatized 1s), est_true_ppm. */
  def debiasedRate(rr: DataFrame, groupCol: String, pPpm: Long,
                   rrCol: String = "rr_bit"): DataFrame =
    rr.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(rrCol).cast("long")).as("n_reported"))
      .withColumn("est_true_ppm",
        least(lit(1000000L), greatest(lit(0L),
          expr(s"((n_reported * 1000000 div n) - $pPpm) * 1000000 " +
            s"div (1000000 - 2 * $pPpm)"))))
}
