package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier gating — the "drop absurd-length documents"
  * curation step, done with median/MAD instead of mean/stddev so a heavy
  * tail can't drag its own gate open (one 10⁹-char document shifts a mean
  * gate enough to admit every other anomaly; it moves a median gate by
  * half a rank).
  *
  * Two aggregation passes over scalars: per-group median of the value,
  * then per-group median of |value − median| (the MAD). Both group tables
  * are #groups rows — broadcast back — so the data path is scan →
  * broadcast join → filter with NO wide shuffle of the input at any
  * scale. The `percentile` aggregate buffers one group's values on a
  * single executor, the right tool while groups fit (languages, sources);
  * for per-group cardinalities beyond that, swap in
  * [[Profile.numericProfile]]'s histogram + cumulative-window quartile
  * path — same number, unbounded cardinality.
  *
  * Exactness: medians of integral values interpolate to exact halves
  * (binary-representable), so the robust z-scores and the keep/drop
  * decisions replay bit-for-bit in an external engine — the gate sits
  * under the exact-value oracle, not a tolerance check.
  */
object Outliers {

  /** Input plus `__med`, `__mad` (per `byCol` group) and `__robust_z` =
    * |v − median| / (MAD · 1.4826), the consistency-scaled robust z-score
    * (1.4826 ≈ 1/Φ⁻¹(3/4) makes MAD estimate σ under normality). Groups
    * with MAD = 0 (over half the values identical) get z = 0 for rows at
    * the median and +∞ (flagged) for any deviation.
    */
  def withRobustZ(df: DataFrame, valueCol: String, byCol: String)
      : DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(byCol)
      .agg(percentile(v, lit(0.5)).as("__med"))
    val dev = df.join(broadcast(med), Seq(byCol))
    val mad = dev.groupBy(byCol)
      .agg(percentile(abs(v - col("__med")), lit(0.5)).as("__mad"))
    dev.join(broadcast(mad), Seq(byCol))
      .withColumn("__robust_z",
        when(col("__mad") > 0,
          abs(v - col("__med")) / (col("__mad") * 1.4826))
          .otherwise(when(v === col("__med"), 0d)
            .otherwise(lit(Double.PositiveInfinity))))
  }

  /** Rows whose robust z-score is ≤ `k` (the survivors). `k = 3.5` is the
    * conventional Iglewicz–Hoaglin cut. */
  def gate(df: DataFrame, valueCol: String, byCol: String,
           k: Double = 3.5): DataFrame =
    withRobustZ(df, valueCol, byCol)
      .filter(col("__robust_z") <= k)
      .drop("__med", "__mad", "__robust_z")

  /** Per-group gate report: rows kept/dropped and the gate's actual
    * bounds — the audit artifact a curation run logs next to its output. */
  def report(df: DataFrame, valueCol: String, byCol: String,
             k: Double = 3.5): DataFrame = {
    val v = col(valueCol).cast("double")
    withRobustZ(df, valueCol, byCol)
      .groupBy(byCol)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__robust_z") <= k, 1L).otherwise(0L)).as("n_kept"),
        round(max("__med"), 4).as("med"),
        round(max("__mad"), 4).as("mad"),
        round(min(when(col("__robust_z") <= k, v)), 4).as("kept_lo"),
        round(max(when(col("__robust_z") <= k, v)), 4).as("kept_hi"))
  }
}
