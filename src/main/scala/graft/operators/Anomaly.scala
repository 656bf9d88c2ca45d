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
  * the decision replays bit-for-bit on any engine.
  *
  * Overflow envelope (64-bit, ANSI mode throws on breach rather than
  * silently wrapping): both sides are bounded by (k·n·xmax)², so the
  * operator is exact while `k · n_buckets · max_count ≤ 3·10⁹` — e.g.
  * k = 3 with 10⁴ hourly buckets (≈ 14 months) and ≤ 10⁵ events per
  * bucket. That covers per-(group, hour) monitor series by a wide
  * margin; a series beyond it should pre-aggregate to coarser buckets,
  * or swap the four arithmetic columns to DECIMAL(38,0) (drop-in: the
  * identity and the DuckDB replay are unchanged, HUGEINT on the oracle
  * side) at ~2× the comparison cost.
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
