package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding aggregation — mean-pool vectors per group: chunk → document
  * rollups, per-cluster/per-class centroids, label prototypes. The
  * distributed shape is the LONG form: `posexplode` to (group, dim, value)
  * and aggregate per (group, dim) — fixed-width rows with map-side
  * partial sums, so the exchange carries one (group, dim, sum, count)
  * row per mapper-side group however many vectors pool. Pooling whole
  * arrays through a single reducer per group (collect-then-average)
  * would funnel every vector's bytes; this never moves an array.
  */
object EmbedPool {

  /** Long-form mean pooling: (byCol, pos, mean) — one row per group and
    * dimension. The oracle-friendly face (scalar columns only).
    */
  def meanPoolLong(df: DataFrame, byCol: String, vecCol: String): DataFrame =
    df.select(col(byCol), posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .groupBy(byCol, "pos")
      .agg(avg(col("__v").cast("double")).as("mean"))

  /** Array face: (byCol, vec_mean) with dimensions reassembled in order.
    * The per-group collect is dim-sized (one struct per dimension), not
    * corpus-sized.
    */
  def meanPool(df: DataFrame, byCol: String, vecCol: String): DataFrame =
    meanPoolLong(df, byCol, vecCol)
      .groupBy(byCol)
      .agg(array_sort(collect_list(struct(col("pos"), col("mean"))))
        .as("__a"))
      .select(col(byCol),
        transform(col("__a"), x => x.getField("mean")).as("vec_mean"))
}
