package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucket-spine gap filling for count series — the step a monitor runs
  * BEFORE statistics ([[Anomaly]]): a groupBy over raw events emits
  * rows only for buckets that HAVE events, so "the crawler went dark
  * for six hours" is invisible to any downstream mean/σ — absence must
  * become an explicit zero first. Every group gets the GLOBAL
  * [min, max] bucket spine (per-group bounds would hide a source that
  * went dark at the start or end of the window).
  *
  * Scale shape: the input is an already-aggregated series (buckets ×
  * groups, metadata-sized relative to its corpus). The spine is a
  * broadcast one-row bounds crossJoin exploded per group — never a
  * per-event structure — and the fill is one left join on
  * (group, bucket). Everything here prices as metadata.
  */
object GapFill {

  /** Zero-fill missing hourly buckets. `series` is one row per
    * (groupCol, hourCol) with an integer `countCol`; returns the same
    * shape with every hour of the global span present per group and
    * `countCol` = 0 where the input had no row.
    */
  def fillHourly(series: DataFrame, groupCol: String, hourCol: String,
                 countCol: String): DataFrame = {
    val bounds = series.agg(min(col(hourCol)).as("__lo"),
      max(col(hourCol)).as("__hi"))
    val spine = series.select(col(groupCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(groupCol),
        explode(expr("sequence(__lo, __hi, interval 1 hour)"))
          .as(hourCol))
    spine.join(series, Seq(groupCol, hourCol), "left")
      .select(col(groupCol), col(hourCol),
        coalesce(col(countCol), lit(0L)).as(countCol))
  }
}
