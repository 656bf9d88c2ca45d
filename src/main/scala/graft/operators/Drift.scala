package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus versions — the
  * "did the new crawl shift my data?" check a curation pipeline runs
  * before retraining on refreshed sources. Population Stability Index
  * over integer-exact equi-width buckets:
  *
  *   PSI = Σ_b (p_cur(b) − p_ref(b)) · ln(p_cur(b) / p_ref(b))
  *
  * with Laplace-smoothed proportions (½ pseudo-count per bucket) so empty
  * buckets contribute finitely. Rule of thumb: < 0.1 stable, 0.1–0.25
  * moderate shift, > 0.25 action.
  *
  * Scale shape: each side is one scan → integer bucket id → ≤ nBuckets-key
  * groupBy (map-side combine; the shuffle carries bucket counts, never
  * rows); totals are one-row aggregates broadcast back; the bucket spine
  * join is nBuckets rows. Bucketing uses integer `div` over caller-scaled
  * integer values (cents and the like), so bucket placement replays
  * bit-for-bit on any engine — no double-boundary rounding drift.
  */
object Drift {

  /** Per-bucket drift report between `ref` and `cur` over integer column
    * `valueCol`: (bucket, ref_n, cur_n, psi_term). Values below `lo` clamp
    * into bucket 0, at or above `lo + width·nBuckets` into the last —
    * drift INTO the tails still registers. Overall PSI = sum(psi_term).
    */
  def psiBuckets(ref: DataFrame, cur: DataFrame, valueCol: String,
                 lo: Long, width: Long, nBuckets: Int): DataFrame = {
    require(width > 0 && nBuckets > 0)
    val spark = ref.sparkSession
    def counts(df: DataFrame, name: String): DataFrame =
      df.select(least(expr(
          s"greatest(`$valueCol` - ${lo}L, 0L) div ${width}L"),
          lit(nBuckets - 1L)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(name))
    val spine = spark.range(nBuckets).toDF("bucket")
    val half = lit(0.5)
    val smoothTotal = half * nBuckets
    val joined = spine
      .join(counts(ref, "ref_n"), Seq("bucket"), "left")
      .join(counts(cur, "cur_n"), Seq("bucket"), "left")
      .na.fill(0L, Seq("ref_n", "cur_n"))
      .crossJoin(broadcast(ref.agg(count(lit(1)).as("ref_total"))))
      .crossJoin(broadcast(cur.agg(count(lit(1)).as("cur_total"))))
    val pr = (col("ref_n").cast("double") + half) /
      (col("ref_total").cast("double") + smoothTotal)
    val pc = (col("cur_n").cast("double") + half) /
      (col("cur_total").cast("double") + smoothTotal)
    joined.select(col("bucket"), col("ref_n"), col("cur_n"),
      ((pc - pr) * log(pc / pr)).as("psi_term"))
  }

  /** The scalar PSI: one double. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
          lo: Long, width: Long, nBuckets: Int): Double =
    psiBuckets(ref, cur, valueCol, lo, width, nBuckets)
      .agg(sum("psi_term")).head().getDouble(0)
}
