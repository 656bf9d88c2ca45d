package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FrequentItems

/** Exact heavy hitters over an unbounded-vocabulary item stream — the
  * corpus-analysis primitive behind stopword discovery, boilerplate n-gram
  * detection and hot-key profiling (the reference ships no frequency
  * operator; its `SELECT ... GROUP BY` surface would word-count the whole
  * vocabulary).
  *
  * The naive plan — `groupBy(item).count` then filter by the global total —
  * shuffles one row per DISTINCT item. On a 100 TB text corpus the n-gram
  * vocabulary is billions of keys, so the exchange and the final aggregate
  * pay for the whole dictionary to read off a few hundred frequent items.
  * This operator is the classic two-pass sketch-then-verify instead:
  *
  *  1. ONE pass builds a mergeable Misra–Gries summary ([[FrequentItems]],
  *     k = 2·denom counters): a partial aggregate per partition, a shuffle
  *     of O(partitions × k) rows, and the n/(k+1) < threshold/2 error bound
  *     guarantees every item with f > n/denom is among the ≤ k candidates.
  *     The same aggregate row carries the exact global item count n.
  *  2. A second pass re-counts ONLY the candidates exactly: the ≤ k items
  *     broadcast into an `isin` filter that prunes at the scan, so the
  *     groupBy shuffles at most k distinct keys.
  *
  * The output is therefore EXACT and deterministic — `{(item, f) : f·denom
  * > n}` — even though pass 1's extra light candidates are partition-order
  * dependent; they are filtered by the exact recount. Cost: two scans of
  * the item stream (at scale, persist the tokenized column or accept the
  * re-tokenize; both beat a vocabulary-wide shuffle).
  */
object HeavyHitters {

  /** Items with exact frequency strictly above n/denom, as
    * (item, cnt, n) rows. `items` must be a single-column DataFrame (one
    * row per item occurrence); re-evaluating it must be deterministic
    * (both passes read it). */
  def exactHeavy(items: DataFrame, denom: Int): DataFrame = {
    require(denom >= 2, s"denom must be >= 2, got $denom")
    FrequentItems.register(items.sparkSession)
    val itemCol = items.columns.head
    // "cnt"/"n" are the operator's output columns — an input column with
    // either name would silently collide (all internal work happens on a
    // reserved alias, but the OUTPUT would carry duplicate names)
    require(itemCol != "cnt" && itemCol != "n",
      s"item column '$itemCol' collides with the output columns cnt/n — rename it")
    val its = items.select(col(itemCol).as("__hh_item"))
    // pass 1: sketch + global count in ONE aggregate (one scan); the
    // result is a single row of ≤ 2·denom candidates — metadata-priced
    val row = its.agg(
      FrequentItems.sketch(col("__hh_item"), lit(2 * denom)).as("sk"),
      count(col("__hh_item")).as("n")).head() // non-null occurrences only
    val n = row.getAs[Long]("n")
    val candidates: Seq[Any] =
      row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("sk")
        .map(_.get(0)).toSeq
    if (candidates.isEmpty) {
      // empty input: no candidates, no heavy hitters
      return its.limit(0)
        .select(col("__hh_item").as(itemCol), lit(0L).as("cnt"),
          lit(0L).as("n"))
    }
    // pass 2: exact recount of the candidate set only — the isin literal
    // list pushes into the scan, the shuffle carries ≤ 2·denom keys
    its.filter(col("__hh_item").isin(candidates: _*))
      .groupBy("__hh_item")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * denom > n) // integer-exact threshold
      .select(col("__hh_item").as(itemCol), col("cnt"), lit(n).as("n"))
  }

  /** Convenience: heavy hitters over an expression of `df`. */
  def exactHeavy(df: DataFrame, item: Column, denom: Int): DataFrame =
    exactHeavy(df.select(item.as("item")), denom)

  /** Per-group exact heavy hitters: items with frequency > n_g/denom
    * WITHIN each group g, as (group, item, cnt, n) rows.
    *
    * Same two passes, grouped: pass 1 is `groupBy(group).agg(graft_mg)` —
    * the sketch is a real aggregate, so it partial-merges per group like
    * any built-in and the exchange carries ≤ k counters per (partition,
    * group), never a vocabulary. The ≤ groups × k candidate (group, item)
    * pairs collect to the driver (metadata-priced for the few-hundred-
    * group case this targets — per-language/per-source corpus analysis),
    * broadcast back as an inner join that prunes pass 2's recount before
    * its shuffle. Group totals ride the same pass-1 aggregate row.
    */
  def exactHeavyPerGroup(df: DataFrame, groupCol: String, itemCol: String,
                         denom: Int): DataFrame = {
    require(denom >= 2, s"denom must be >= 2, got $denom")
    require(groupCol != "cnt" && groupCol != "n" &&
      itemCol != "cnt" && itemCol != "n",
      s"'$groupCol'/'$itemCol' collide with the output columns cnt/n — rename")
    val spark = df.sparkSession
    FrequentItems.register(spark)
    // reserved aliases: the caller's names come back only on the output
    val d2 = df.select(col(groupCol).as("__hh_g"), col(itemCol).as("__hh_item"))
    val sketches = d2.groupBy("__hh_g")
      .agg(FrequentItems.sketch(col("__hh_item"), lit(2 * denom)).as("sk"),
        count(col("__hh_item")).as("n"))
      .collect()
    if (sketches.isEmpty)
      return d2.limit(0).select(col("__hh_g").as(groupCol),
        col("__hh_item").as(itemCol), lit(0L).as("cnt"), lit(0L).as("n"))
    import scala.jdk.CollectionConverters._
    val candRows: java.util.List[org.apache.spark.sql.Row] =
      sketches.flatMap { r =>
        val g = r.get(0)
        r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("sk")
          .map(c => org.apache.spark.sql.Row(g, c.get(0)))
      }.toList.asJava
    val gi = d2.schema
    val cand = spark.createDataFrame(candRows, gi)
    val totals = spark.createDataFrame(
      sketches.map(r => org.apache.spark.sql.Row(r.get(0),
        r.getAs[Long]("n"))).toList.asJava,
      org.apache.spark.sql.types.StructType(Seq(gi.head,
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false))))
    d2.join(broadcast(cand), Seq("__hh_g", "__hh_item"))
      .groupBy("__hh_g", "__hh_item")
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(totals), Seq("__hh_g"))
      .filter(col("cnt") * denom > col("n"))
      .select(col("__hh_g").as(groupCol), col("__hh_item").as(itemCol),
        col("cnt"), col("n"))
  }
}
