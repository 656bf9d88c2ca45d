package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Anomaly detection over grouped count series — the "did a source
  * start flooding / did a crawl host go dark" monitor a continuous
  * ingestion pipeline runs per batch. Flags buckets whose count sits
  * more than `k` standard deviations from their group's mean.
  *
  * Exactness: the z-test is evaluated ENTIRELY in integer arithmetic —
  * |x − s/n| > k·σ with σ² = (q − s²/n)/n is equivalent (for k, n > 0)
  * to (n·x − s)² > k²·(n·q − s²), where n, s = Σx, q = Σx² are exact
  * integer aggregates of the counts. No sqrt, no division, no doubles:
  * the decision replays bit-for-bit on any engine. Overflow headroom:
  * with per-bucket counts ≤ 10⁶ and ≤ 10⁵ buckets per group, both
  * sides stay ≤ ~10¹⁷ < 2⁶³ (the operator is per-GROUP statistics —
  * groups are bounded series like hours × event types, not the corpus).
  *
  * Scale shape: one groupBy over the (already metadata-sized) count
  * series for the moments, broadcast back onto the series (group-count
  * rows), then a pure filter projection. At 100 TB the cost is the
  * upstream count aggregation; the anomaly pass itself prices as
  * metadata.
  */
object Anomaly {

  /** Flag buckets where (n·x − s)² > k²·(n·q − s²). Input: one row per
    * (group, bucket) with an integer count column. Returns flagged rows
    * as (groupCol, bucketCol, count, n_buckets, sum_n, lhs, rhs) — the
    * integer evidence columns make the decision auditable and the
    * oracle replay trivial.
    */
  def countSpikes(series: DataFrame, groupCol: String, bucketCol: String,
                  countCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val moments = series.groupBy(groupCol)
      .agg(count(lit(1)).as("n_buckets"),
        sum(col(countCol)).as("sum_n"),
        sum(col(countCol) * col(countCol)).as("sum_sq"))
    series
      .join(broadcast(moments), groupCol)
      .withColumn("lhs", expr(
        s"(n_buckets * $countCol - sum_n) * " +
          s"(n_buckets * $countCol - sum_n)"))
      .withColumn("rhs",
        expr(s"${k.toLong * k} * (n_buckets * sum_sq - sum_n * sum_n)"))
      .filter(col("lhs") > col("rhs"))
      .select(col(groupCol), col(bucketCol), col(countCol),
        col("n_buckets"), col("sum_n"), col("lhs"), col("rhs"))
  }
}
