package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) over two integer criteria, both minimized —
  * the dominance query behind "which configs/sources/suppliers are not
  * strictly beaten on every axis" (Börzsönyi et al., ICDE'01 "The
  * Skyline Operator"). A row is ON the skyline iff no other row is ≤ on
  * both axes and < on at least one; maximized criteria enter negated.
  *
  * Scale shape — the point of this implementation: NO all-pairs
  * dominance test and NO single-task global window. Rows bucket into P
  * value bands of the x axis (band width from one 1-row min/max
  * aggregate, so banding is deterministic and replayable):
  *
  *  - CROSS-BUCKET dominance collapses to a prefix minimum over the
  *    per-bucket min(y) — P rows, computed once and broadcast-joined
  *    back. Any row in an earlier bucket has strictly smaller x (integer
  *    bands do not overlap), so `prefix_min_y ≤ y` alone decides
  *    dominance from the left.
  *  - IN-BUCKET dominance is two windows PARTITIONED BY BUCKET (never a
  *    global orderBy): min(y) over x' < x inside the bucket
  *    (rangeBetween to -1) and min(y) over ties x' = x. Work per
  *    partition ∝ bucket occupancy — P scales with the cluster.
  *
  * The BNL/NN skyline algorithms from the literature are driver-side;
  * this is the partition-parallel band formulation, exact (dominance is
  * transitive, and every potential dominator of a row sits in its own
  * or an earlier band — later bands have strictly larger x and cannot
  * dominate).
  */
object Skyline {

  /** Rows of `df` on the Pareto frontier of (`xCol`, `yCol`), both
    * minimized; both must be integral for exact cross-engine replay.
    * `buckets` = number of x-bands (set ∝ parallelism). */
  def frontier(df: DataFrame, xCol: String, yCol: String,
               buckets: Int = 32): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    // one tiny aggregate prices the banding; width ≥ 1 keeps div sane
    val Array(r) = df.agg(min(x).as("mn"), max(x).as("mx"))
      .select(col("mn"),
        expr(s"greatest((mx - mn + 1) div ${buckets}L, 1L)").as("w"))
      .collect()
    if (r.isNullAt(0)) return df.limit(0)
    val (mn, w) = (r.getLong(0), r.getLong(1))
    // integer band id — `div`, never `/` (double division loses exactness
    // past 2^53 and this axis carries scaled-integer money sums)
    val banded = df.withColumn("__b",
      expr(s"(CAST($xCol AS BIGINT) - ${mn}L) div ${w}L"))

    // cross-bucket: prefix min of per-bucket min(y) over earlier buckets
    val perBucket = banded.groupBy("__b").agg(min(y).as("__bymin"))
    val prefix = perBucket.withColumn("__pmin",
      min("__bymin").over(
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__b"), col("__pmin"))

    // in-bucket: windows partitioned by band — parallel across bands
    val wLt = Window.partitionBy("__b").orderBy(x)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy(col("__b"), x)
    val marked = banded
      .join(broadcast(prefix), Seq("__b"), "left")
      .withColumn("__minlt", min(y).over(wLt))
      .withColumn("__mineq", min(y).over(wEq))
    val dominated: Column =
      (col("__pmin").isNotNull && col("__pmin") <= y) ||
      (col("__minlt").isNotNull && col("__minlt") <= y) ||
      (col("__mineq") < y)
    marked.where(!dominated)
      .drop("__b", "__pmin", "__minlt", "__mineq")
  }
}
