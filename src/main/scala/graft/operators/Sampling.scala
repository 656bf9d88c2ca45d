package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * `xxhash64(key, seed)` in each stratum.
    *
    * Two-level ranking: rows first rank within (stratum, salt) — the full
    * data spreads across `parallelism × #strata` window partitions — and
    * only the ≤ `n` survivors per salt rank again within the stratum. A
    * single per-stratum window would funnel every row of a stratum through
    * one reducer; top-n-by-a-total-order is associative, so the two-level
    * result is identical.
    */
  def stratifiedExact(df: DataFrame, strataCol: String, n: Int,
                      keyCol: String, seed: Long = 42L): DataFrame = {
    val salts = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    val h = xxhash64(col(keyCol), lit(seed))
    val w1 = Window.partitionBy(col(strataCol),
        pmod(xxhash64(col(keyCol), lit(seed + 1)), lit(salts)))
      .orderBy(h, col(keyCol))
    val w2 = Window.partitionBy(strataCol).orderBy(h, col(keyCol))
    df.withColumn("__rk", row_number().over(w1))
      .filter(col("__rk") <= n)
      .withColumn("__rk", row_number().over(w2))
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
      takeSmallestByHash(df, keyCol, seed, counts(i))
        .withColumn("__source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Temperature-weighted resampling WITH repetition — the "sample source
    * i proportional to nᵢ^α" recipe multilingual/multi-domain training
    * mixes use to boost low-resource groups without starving the head
    * (α=1 keeps natural proportions, α→0 approaches uniform-over-groups).
    * Each group's expected row count is `targetRows · nᵢ^α / Σⱼnⱼ^α`;
    * groups above their natural size UPSAMPLE (rows repeat, tagged with a
    * `copy` ordinal), groups below it downsample.
    *
    * Per row: `copies = ⌊rate⌋ + [hash01(key) < frac(rate)]` — a
    * deterministic Bernoulli on the row key, so reruns, retries and
    * incremental extensions reproduce the same multiset. Scale shape: the
    * per-group rate comes from ONE tiny count aggregate collected to the
    * driver (#groups rows — metadata-priced), then the corpus path is a
    * broadcast rate join + `posexplode` — ZERO data shuffles at any SF.
    *
    * Exact cross-engine replay (the oracle face): rates are computed in a
    * PINNED evaluation order — `((wᵢ/S)·targetRows)/nᵢ` with
    * `wᵢ = sqrt(nᵢ)` when α=0.5 (IEEE-exact in every engine, unlike pow)
    * and `S` summed in group-name order — so an external engine derives
    * bit-identical rates, and with a portable `hash01` (e.g. the 60-bit
    * md5 rendering the *_fixed queries use) bit-identical copy counts. */
  def temperatureResample(df: DataFrame, byCol: String, keyCol: String,
                          targetRows: Long, alpha: Double = 0.5,
                          hash01: Column => Column = defaultHash01)
      : DataFrame = {
    require(targetRows > 0, "targetRows must be positive")
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    // one #groups-row aggregate; groups are sources/langs — metadata-sized
    val counts = df.groupBy(col(byCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val wts = counts.map { case (_, n) =>
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    }
    val s = wts.foldLeft(0.0)(_ + _) // group-name order, replayable
    val rates = counts.zip(wts).map { case ((g, n), w) =>
      (g, ((w / s) * targetRows.toDouble) / n.toDouble) // pinned order
    }
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = broadcast(rates.toSeq.toDF("__g", "__rate"))
    val frac = col("__rate") - floor(col("__rate"))
    val copies = (floor(col("__rate")).cast("long") +
      when(hash01(col(keyCol)) < frac, 1L).otherwise(0L)).cast("int")
    df.join(rateDf, col(byCol).cast("string") === col("__g"))
      .withColumn("__copies", copies)
      .select(col("*"), posexplode(array_repeat(lit(1), col("__copies")))
        .as(Seq("copy", "__one")))
      .drop("__g", "__rate", "__copies", "__one")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    * IPL 2006): per-row key `-ln(u)/w` with `u` the portable per-row
    * uniform; the k SMALLEST keys are distributed exactly as k
    * sequential draws without replacement with probabilities ∝ weight —
    * the quality-weighted corpus-subset draw. One pass, no state: the
    * selection is a global top-k (TakeOrderedAndProject — per-partition
    * heaps, k rows to the driver, no global sort), deterministic given
    * `tag` so retries and repartitioning reproduce the same sample.
    * Non-positive weights are excluded (they cannot be drawn).
    */
  def weightedSampleNoReplace(df: DataFrame, k: Int, weightCol: String,
                              keyCol: String, tag: String): DataFrame = {
    require(k > 0)
    df.filter(col(weightCol) > 0)
      .withColumn("sample_key",
        -log(portableHash01(tag)(col(keyCol))) /
          col(weightCol).cast("double"))
      .orderBy(col("sample_key").asc, col(keyCol).asc)
      .limit(k)
  }

  /** xxhash64 key → uniform [0,1) via the unsigned top 53 bits. */
  def defaultHash01(key: Column): Column =
    shiftrightunsigned(xxhash64(key, lit(42L)), 11)
      .cast("double") / lit((1L << 53).toDouble)

  /** Portable [0,1) hash: 60-bit md5-derived value an external engine can
    * re-render exactly (`'0x' || substring(md5(tag:key),1,15)` as a long,
    * over 2^60) — the oracle-face twin of [[defaultHash01]]. */
  def portableHash01(tag: String)(key: Column): Column =
    conv(substring(md5(concat(lit(tag + ":"), key.cast("string"))), 1, 15),
      16, 10).cast("long").cast("double") / lit(math.pow(2, 60))

  /** Exactly the `k` rows with the smallest `xxhash64(key, seed)`, computed
    * distributively: range-repartition on the hash (a distributed sort —
    * every partition holds a contiguous hash range), then `zipWithIndex`
    * turns local ranks into global ordinals with one extra count job. A
    * global `row_number()` window would move ALL rows to a single reducer;
    * this never materializes more than a partition anywhere. The (hash,
    * key) order is a strict total order, so the selected set is exact and
    * deterministic regardless of input partitioning.
    */
  private def takeSmallestByHash(df: DataFrame, keyCol: String, seed: Long,
                                 k: Int): DataFrame = {
    if (k <= 0) return df.limit(0)
    val spark = df.sparkSession
    val sorted = df.withColumn("__h", xxhash64(col(keyCol), lit(seed)))
      .repartitionByRange(col("__h"), col(keyCol))
      .sortWithinPartitions("__h", keyCol)
    val schema = sorted.schema
    val picked = sorted.rdd.zipWithIndex()
      .filter(_._2 < k).map(_._1)
    spark.createDataFrame(picked, schema).drop("__h")
  }
}
