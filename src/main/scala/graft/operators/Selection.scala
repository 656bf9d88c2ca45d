package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budgeted corpus selection — "take the best documents until N tokens":
  * order the corpus by a preference key, accumulate a weight (token
  * count), keep every row whose inclusive running total stays within the
  * budget. The defining constraint at scale is the GLOBAL prefix sum: a
  * naive `Window.orderBy` with no partitioning funnels the entire corpus
  * through one task, so [[takeUntilBudget]] uses the distributed form —
  * range-partition on the order key (a distributed sort: each task owns a
  * contiguous key slice), local running totals per slice, then each
  * slice's starting offset from the per-slice totals (a #partitions-row
  * collect, metadata-priced) added back via broadcast join. Identical
  * result, no single-task funnel — the same construction as
  * [[Profile]]'s exact quartiles.
  *
  * Exactness: weights are integers (token counts), so running totals are
  * exact in any engine and the keep/drop boundary replays bit-for-bit;
  * the order key must be made total (break ties with a unique id) or the
  * boundary row would be engine-dependent.
  */
object Selection {

  /** Rows whose inclusive running `weightCol` total, in `(orderBy,
    * tieCol)` order, is ≤ `budget` — plus the running total itself as
    * `cum_weight`. `orderBy` descending-ness is the caller's: pass the
    * desired sort columns explicitly (e.g. `col("q").desc`); `tieCol`
    * is appended ascending to make the order total.
    */
  def takeUntilBudget(df: DataFrame, weightCol: String, orderBy: Seq[Column],
                      tieCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val parts =
      math.max(df.sparkSession.sparkContext.defaultParallelism, 2)
    val order = orderBy :+ col(tieCol).asc
    // distributed sort: each partition owns a contiguous slice of the
    // global order; the local window below never crosses slices
    val sliced = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lcum", sum(col(weightCol).cast("long")).over(
        Window.partitionBy("__pid").orderBy(order: _*)))
      .persist()
    // per-slice totals: #partitions rows — driver-side prefix sums
    val totals = sliced.groupBy("__pid")
      .agg(sum(col(weightCol).cast("long")).as("__pt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = broadcast(totals.keys.toSeq.sorted.map { pid =>
      pid -> totals.filter(_._1 < pid).values.sum
    }.toDF("__pid", "__off"))
    val out = sliced.join(offsets, Seq("__pid"))
      .withColumn("cum_weight", col("__lcum") + col("__off"))
      .filter(col("cum_weight") <= budget)
      .drop("__pid", "__lcum", "__off")
    out
  }

  /** Per-group budget: within each `byCol` group, keep rows whose running
    * total in `(orderBy, tieCol)` order stays ≤ `budgetPerGroup`. The
    * window partitions by group, so parallelism = #groups and one giant
    * group serializes — the documented trade; for a single giant group
    * use [[takeUntilBudget]] on the filtered slice instead.
    */
  def takeUntilBudgetPerGroup(df: DataFrame, byCol: String, weightCol: String,
                              orderBy: Seq[Column], tieCol: String,
                              budgetPerGroup: Long): DataFrame =
    df.withColumn("cum_weight",
        sum(col(weightCol).cast("long")).over(
          Window.partitionBy(byCol).orderBy(orderBy :+ col(tieCol).asc: _*)))
      .filter(col("cum_weight") <= budgetPerGroup)

  /** Per-group frequency cap — "at most `n` documents per host/source",
    * the per-domain cap every web-corpus recipe applies (FineWeb, Dolma)
    * so no single domain dominates the mixture. Keeps the top `n` rows
    * of each `byCol` group in `(orderBy, tieCol)` order and reports the
    * rank. The window partitions by group, so parallelism = #groups
    * (hosts — millions at web scale, never a funnel) and state per task
    * is one counter; ordering must be made total via `tieCol` or the
    * boundary row would be engine-dependent.
    */
  def capPerGroup(df: DataFrame, byCol: String, orderBy: Seq[Column],
                  tieCol: String, n: Int): DataFrame = {
    require(n >= 1)
    df.withColumn("rank_in_group",
        row_number().over(
          Window.partitionBy(byCol).orderBy(orderBy :+ col(tieCol).asc: _*)))
      .filter(col("rank_in_group") <= n)
  }
}
