package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source score calibration — the step before any GLOBAL quality
  * cutoff on a heterogeneous corpus: raw quality scores are not
  * comparable across sources (a web crawl's median is a curated
  * archive's floor), so "keep global top 30%" over raw scores silently
  * keeps whole sources and drops others. Rank-normalizing within each
  * source maps every score to its source-relative percentile; a global
  * cutoff then takes the same FRACTION of every source (the FineWeb /
  * CCNet per-source bucketing recipe generalized to any score).
  *
  * Exactness: the percentile is integer —
  * `pct_ppm = (rank − 1)·10⁶ div (n − 1)` (0 for a 1-row source) with
  * `rank` from a declared total order (score desc, id asc), so every
  * keep/drop decision replays bit-for-bit on any engine.
  *
  * Scale shape: one window partitioned by SOURCE over (id, score)
  * scalars (parallelism = #sources; text never shuffles) plus a
  * broadcast one-row-per-source count join. The cutoff is then a pure
  * filter projection.
  */
object Calibrate {

  /** Add `pct_ppm` — the within-source percentile of `scoreCol` under
    * (score desc, id asc) — to one row per (source, id, score). */
  def percentileBySource(scored: DataFrame, sourceCol: String,
                         idCol: String, scoreCol: String): DataFrame = {
    val counts = scored.groupBy(sourceCol)
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(sourceCol)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    scored
      .join(broadcast(counts), sourceCol)
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("pct_ppm",
        when(col("__n") > 1,
          expr("(__rk - 1) * 1000000L div (__n - 1)"))
          .otherwise(lit(0L)))
      .drop("__rk", "__n")
  }

  /** Keep each source's top fraction: rows with
    * `pct_ppm < keepPpm` (rank-calibrated, so every source contributes
    * the same share regardless of its raw score distribution). */
  def keepTopPerSource(scored: DataFrame, sourceCol: String,
                       idCol: String, scoreCol: String,
                       keepPpm: Long): DataFrame = {
    require(keepPpm >= 0L && keepPpm <= 1000000L)
    percentileBySource(scored, sourceCol, idCol, scoreCol)
      .filter(col("pct_ppm") < keepPpm)
  }
}
