package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for training-data curation. Randomness comes from
  * `xxhash64(keyCol, seed)` — a pure function of the data — so every run,
  * every retry, and every executor reshuffle selects the SAME rows (Spark's
  * `sample()` is seed-stable only for a fixed partitioning, which a lake
  * table does not guarantee). That determinism is what makes sampled
  * training sets reproducible and incrementally extendable.
  */
object Sampling {

  /** Exact-size per-stratum sample: the `n` rows with the smallest
    * `xxhash64(key, seed)` in each stratum. One window pass per stratum
    * (shuffle on the stratum column only).
    */
  def stratifiedExact(df: DataFrame, strataCol: String, n: Int,
                      keyCol: String, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(xxhash64(col(keyCol), lit(seed)), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Hash-fraction sample: keep rows whose key hashes below `fraction` of
    * the hash space — O(1) per row, no shuffle, deterministic, and
    * MONOTONE: raising the fraction strictly grows the previous sample
    * (incremental dataset scaling without reshuffling what was already
    * selected).
    */
  def hashSample(df: DataFrame, fraction: Double, keyCol: String,
                 seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    // map hash to [0,1) via its unsigned top 53 bits
    val u = shiftrightunsigned(xxhash64(col(keyCol), lit(seed)), 11)
      .cast("double") / lit((1L << 53).toDouble)
    df.filter(u < fraction)
  }

  /** Weighted dataset mixture: per source, an exact share of `totalRows`
    * (largest-remainder rounding so shares sum exactly to `totalRows`),
    * drawn deterministically via [[stratifiedExact]] machinery, tagged with
    * its source name. The construction step behind every "X% web, Y% code,
    * Z% books" training mix.
    */
  def mixture(sources: Seq[(String, DataFrame, Double)], totalRows: Int,
              keyCol: String, seed: Long = 42L): DataFrame = {
    require(sources.nonEmpty, "mixture needs at least one source")
    val wsum = sources.map(_._3).sum
    val raw = sources.map { case (_, _, w) => totalRows * w / wsum }
    val base = raw.map(_.toInt)
    var remainder = totalRows - base.sum
    // largest fractional parts get the leftover rows
    val order = raw.zipWithIndex.sortBy { case (r, _) => -(r - r.toInt) }
      .map(_._2)
    val counts = base.toArray
    order.foreach { i => if (remainder > 0) { counts(i) += 1; remainder -= 1 } }

    sources.zipWithIndex.map { case ((name, df, _), i) =>
      val w = Window.orderBy(xxhash64(col(keyCol), lit(seed)), col(keyCol))
      df.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= counts(i))
        .drop("__rk")
        .withColumn("__source", lit(name))
    }.reduce(_ unionByName _)
  }
}
