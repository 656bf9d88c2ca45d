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
  * `saltFactor`×, so keep it the smaller relation.
  */
object SkewJoin {

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
}
