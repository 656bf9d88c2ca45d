package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: points against intervals (`lo <= p <= hi`) WITHOUT
  * the quadratic plan. Spark's optimizer has no range-join strategy — a
  * plain `points.join(intervals, p.between(lo, hi))` physical-plans as a
  * BroadcastNestedLoopJoin (or a cartesian), O(|points| × |intervals|)
  * comparisons, which is the first thing that dies when either side grows.
  *
  * The standard fix (the "bin/bucket range join" every warehouse engine
  * implements natively): quantize the domain into `bucketWidth`-sized
  * buckets, explode each interval into the buckets it covers, map each
  * point to its single bucket, equi-join on the bucket id, then apply the
  * exact `between` as a residual filter. The join becomes a hash/sort-merge
  * equi-join Spark shuffles and AQE-skew-handles like any other; the cost
  * model is |points| + Σ(interval_len/bucketWidth + 1) shuffled rows, so
  * pick `bucketWidth` near the median interval length (replication ≈ 2×).
  *
  * Intervals are treated as closed on both ends; points on a shared
  * boundary match both abutting intervals, exactly like the naive form.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
