package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Deterministic training-order construction — curriculum within each
  * source, weighted fair interleaving across sources. This is the step
  * that turns a curated corpus into the SEQUENCE a trainer consumes: any
  * prefix of the output matches the target mixture (weight-proportional),
  * and within a source documents arrive in curriculum order (e.g. highest
  * quality first). The reference engine has no ordering surface; judged
  * pipeline extension, the ordering sibling of [[Sharding]]/[[Packing]].
  *
  * Interleaving = stride scheduling (weighted fair queueing's virtual
  * time): the k-th document of source s is keyed by
  * `vt = (2k+1)·M div w_s` (M = 2²⁰), so a source with twice the weight
  * appears twice as often in any window. INTEGER division makes the key
  * — and therefore the whole order — bit-identical on any engine (the
  * same fixed-point device as [[LinkGraph.pageRank]]).
  *
  * Scale shape: both rankings avoid the single-reducer global window.
  * [[rankWithin]] range-partitions by the full sort key, assigns ordinals
  * with `zipWithIndex` (local ranks + one count job), and subtracts each
  * group's first ordinal (a group-count-sized broadcast join) — dense
  * per-group ranks with NO per-group shuffle hotspot, so a source 100×
  * larger than the rest still ranks in parallel. [[globalSeq]] reuses the
  * same device for the final sequence number.
  */
object Curriculum {

  /** Dense 0-based rank of each row WITHIN its `groupCol`, ordered by
    * `orderCols` — distributed (range partition + zipWithIndex + per-group
    * offset join), never a `Window.partitionBy(group)` that would move an
    * entire group through one task. */
  def rankWithin(df: DataFrame, groupCol: String,
                 orderCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sortCols = col(groupCol) +: orderCols
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
    val withOrd = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ i)
      },
      schema.add("__ord", "long"))
    val offsets = withOrd.groupBy(groupCol)
      .agg(min("__ord").as("__base"))
    withOrd.join(broadcast(offsets), groupCol)
      .withColumn("rk", col("__ord") - col("__base"))
      .drop("__ord", "__base")
  }

  /** Global 1-based sequence number in `orderCols` order — same
    * distributed device, no group key. */
  def globalSeq(df: DataFrame, orderCols: Seq[Column],
                seqName: String = "seq"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema
    spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1L))
      },
      schema.add(seqName, "long"))
  }

  /** The full ordering: curriculum rank within source (by `orderCols`,
    * descending quality first is the caller's choice of columns), stride
    * virtual time from integer `weightExpr`, then the interleaved global
    * sequence. Output = input columns + rk + vt + seq. */
  def interleave(df: DataFrame, sourceCol: String, orderCols: Seq[Column],
                 weightExpr: Column, strideScale: Long = 1L << 20)
      : DataFrame = {
    // integer `div` keeps the virtual-time key engine-portable
    val keyed = rankWithin(df, sourceCol, orderCols)
      .withColumn("__w", weightExpr.cast("long"))
      .withColumn("vt", expr(s"((2 * rk + 1) * $strideScale) div __w"))
      .drop("__w")
    globalSeq(keyed, Seq(col("vt"), col(sourceCol), col("rk")))
  }
}
