package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. When one join key carries a large share
  * of the rows (a null-ish default, a celebrity user, a hot document
  * cluster), a plain shuffle join lands that key's entire volume on one
  * reducer. Salting splits the hot side's key-space `saltFactor` ways and
  * replicates the other side per salt, bounding any single task at
  * ~1/saltFactor of the hot key.
  *
  * AQE's skew-join handles storage-level skew for sort-merge joins
  * adaptively; explicit salting remains the tool when (a) the build side
  * must replicate (broadcast-unfriendly sizes), (b) skew appears mid-plan
  * after AQE's stats, or (c) a deterministic plan shape is required.
  *
  * Left side is assumed the skewed (big) one; right side is replicated
  * per salt, so keep it the smaller relation.
  */
object SkewJoin {

  /** Blanket salting: every key is split `saltFactor` ways and the whole
    * right side is replicated `saltFactor`×. Simple and deterministic, but
    * on mostly-uniform data it multiplies the right side's shuffle volume
    * for no benefit — prefer [[adaptiveSaltedJoin]], which pays the
    * replication only for keys that are actually hot.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                 saltFactor: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    // deterministic pseudo-random salt per left row: hash of the whole row
    // (monotonically_increasing_id would break retry determinism)
    val leftRowHash = xxhash64(left.columns.map(col): _*)
    val l = left.withColumn("__salt", pmod(leftRowHash, lit(saltFactor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keyCols :+ "__salt", joinType).drop("__salt")
  }

  /** The hottest left-side keys: every key whose row count is at least
    * `hotThreshold`, capped at the `maxHotKeys` largest. One groupBy over
    * the narrow key projection — map-side combine compacts each scan
    * partition to its distinct keys before the exchange, so the counting
    * pass shuffles |distinct keys| rows, not |left|. The cap makes the
    * collected set metadata-priced by construction (≤ maxHotKeys rows via
    * a distributed TakeOrdered, never a full key histogram on the driver).
    */
  def hotKeys(left: DataFrame, keyCols: Seq[String], hotThreshold: Long,
              maxHotKeys: Int = 1024): Array[Seq[Any]] =
    hotKeysFromCounts(left.groupBy(keyCols.map(col): _*).count(),
      keyCols, hotThreshold, maxHotKeys)

  private def hotKeysFromCounts(counts: DataFrame, keyCols: Seq[String],
                                hotThreshold: Long, maxHotKeys: Int)
      : Array[Seq[Any]] =
    counts
      .filter(col("count") >= hotThreshold)
      .orderBy(col("count").desc, struct(keyCols.map(col): _*))
      .limit(maxHotKeys)
      .select(keyCols.map(col): _*)
      .collect()
      .map(r => keyCols.indices.map(r.get))

  /** Salted equi-join that replicates ONLY detected-hot keys.
    *
    * Phase 1 measures: a counting pass over the left's key projection finds
    * keys with ≥ `hotThreshold` rows (≤ `maxHotKeys` of them — broadcast as
    * a set, metadata-priced). Phase 2 joins: left rows on a hot key take a
    * per-row hash salt in [0, saltFactor); cold rows take salt 0. Right rows
    * on a hot key are exploded across all saltFactor salts; cold right rows
    * carry salt 0 only. The join result is row-for-row identical to the
    * plain equi-join (oracle-checkable) — but a hot key's volume now spreads
    * over saltFactor reducers while the right side's shuffle volume grows by
    * only saltFactor × |hot-key rows|, not saltFactor × |right|.
    *
    * `hotThreshold = 0` (the default) derives a threshold from the data:
    * 4× the mean rows-per-key, floored at 256 — uniform data then detects
    * no hot keys and the join degenerates to the plain one-shuffle join
    * plus a cheap counting pass.
    *
    * At 100 TB the counting pass is one shuffle of compact distinct keys;
    * if even that is too much, feed a sampled estimate into `hotThreshold`
    * via `left.sample(f)` and scale — false negatives only cost skew relief,
    * never correctness.
    */
  def adaptiveSaltedJoin(left: DataFrame, right: DataFrame,
                         keyCols: Seq[String], saltFactor: Int = 8,
                         hotThreshold: Long = 0, maxHotKeys: Int = 1024,
                         joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(!Set("right", "rightouter", "right_outer", "full", "outer",
      "fullouter", "full_outer").contains(joinType.toLowerCase),
      "adaptiveSaltedJoin replicates right-side rows; right/full outer " +
        "joins would duplicate their null-extended output")
    // ONE counting pass serves both the auto-threshold and the hot-key
    // scan (persisted: the mean aggregate and the top-k filter would
    // otherwise each re-shuffle the full left relation)
    val counts = left.groupBy(keyCols.map(col): _*).count().persist()
    val hot = try {
      val threshold =
        if (hotThreshold > 0) hotThreshold
        else {
          val stats = counts.agg(avg("count").as("mean")).first()
          val mean = Option(stats.get(0)).fold(0.0)(_.toString.toDouble)
          math.max(256L, (4 * mean).toLong)
        }
      hotKeysFromCounts(counts, keyCols, threshold, maxHotKeys).toSet
    } finally counts.unpersist()
    if (hot.isEmpty) return left.join(right, keyCols, joinType)

    // hot-key membership predicate: a literal isin stays inside codegen for
    // the (typical) single-column key; composite keys fall back to one
    // bounded set probe per row against the broadcast set
    val isHot: Column =
      if (keyCols.size == 1) col(keyCols.head).isin(hot.toSeq.map(_.head): _*)
      else {
        val hotBc = left.sparkSession.sparkContext.broadcast(hot)
        val probe = udf((k: org.apache.spark.sql.Row) =>
          hotBc.value.contains(keyCols.indices.map(k.get)))
        probe(struct(keyCols.map(col): _*))
      }

    val l = left.withColumn("__salt",
      when(isHot,
        pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor)))
        .otherwise(lit(0L)))
    val r = right.withColumn("__salt",
      explode(when(isHot,
        sequence(lit(0L), lit(saltFactor - 1L)))
        .otherwise(array(lit(0L)))))
    l.join(r, keyCols :+ "__salt", joinType).drop("__salt")
  }
}
