package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CUSUM changepoint detection (Page 1954) over keyed count series —
  * the sequential drift detector a pipeline points at ingest volumes,
  * error rates or quality-score streams to catch LEVEL SHIFTS that
  * per-point spike detectors ([[Anomaly]]) miss: a persistent +20%
  * drift alarms once the cumulative excess crosses `h`, even though no
  * single point is anomalous.
  *
  * All arithmetic is integer, scaled by the baseline length B so the
  * reference mean never becomes a float: with `baseSum = Σ first B
  * values`, the monitored increment is `T_i = B·v_i − baseSum −
  * slackTimesB` (slack and threshold are supplied pre-multiplied by B)
  * and `S_i = max(0, S_{i−1} + T_i)`, alarming when `S_i >
  * thresholdTimesB`. Exactly replayable cross-engine — no mean, no
  * variance, no libm.
  *
  * Scale shape: the heavy input (raw events) reduces to (key, slot)
  * counts via one map-side-combinable aggregate BEFORE this operator;
  * here each key's series folds INSIDE one row (`sort_array` +
  * `aggregate`, state = one struct) — per-key work ∝ series length
  * (time slots, bounded by the calendar), keys parallelize across the
  * cluster, and nothing all-pairs or corpus-sized ever shuffles. The
  * recurrence `max(0, ·)` is inherently sequential per key; a window
  * cannot express it, a fold can.
  */
object Changepoint {

  /** Per `keyCol`: fold CUSUM over the (`timeCol`, `valueCol`) series.
    * Returns (key, n_points, base_sum, max_s, alarm_time) where
    * `alarm_time` is the first slot whose S exceeds the threshold
    * (null = no changepoint). Series shorter than `baseline` never
    * alarm (their monitored segment is empty). */
  def cusum(series: DataFrame, keyCol: String, timeCol: String,
            valueCol: String, baseline: Int, slackTimesB: Long,
            thresholdTimesB: Long): DataFrame = {
    require(baseline >= 1)
    val b = baseline
    // each withColumn is its own projection, so the fold below sees
    // base_sum/mon as plain attributes — never re-evaluated per element
    val arr = series.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(timeCol).as("t"), col(valueCol).cast("long").as("v"))))
        .as("pts"))
      .withColumn("n_points", size(col("pts")).cast("long"))
      .withColumn("base_sum", aggregate(slice(col("pts"), 1, b),
        lit(0L), (acc, x) => acc + x("v")))
      .withColumn("mon",
        expr(s"slice(pts, ${b + 1}, greatest(size(pts) - $b, 0))"))
    val zero = struct(lit(0L).as("s"), lit(0L).as("mx"),
      lit(null).cast("timestamp").as("at"))
    val step = (acc: Column, x: Column) => {
      val t = lit(b.toLong) * x("v") - col("base_sum") - lit(slackTimesB)
      val s2 = greatest(acc("s") + t, lit(0L))
      struct(s2.as("s"), greatest(acc("mx"), s2).as("mx"),
        coalesce(acc("at"),
          when(s2 > lit(thresholdTimesB), x("t"))).as("at"))
    }
    arr.withColumn("fold", aggregate(col("mon"), zero, step))
      .select(col(keyCol), col("n_points"), col("base_sum"),
        col("fold.mx").as("max_s"), col("fold.at").as("alarm_time"))
  }
}
